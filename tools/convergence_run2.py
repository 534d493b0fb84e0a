"""Convergence breadth ON CHIP (VERDICT r2 item 6): CenterPoint-pillars
scored through the real nuScenes NDS evaluator, and SMOKE (mono) scored
through the real KITTI AP evaluator.

Like tools/convergence_run.py (PointPillars/KITTI), these are synthetic-
data runs at the REAL model scale: CenterPoint trains at the full 512x512
nuScenes grid with 10 classes + velocity targets on procedurally generated
scenes whose points lie ON the boxes; SMOKE overfits a fixed set of
synthetic mono scenes (random images cannot generalize — the run is
overfit evidence, scored on the training distribution, and says so in its
artifact).

    python tools/convergence_run2.py --family centerpoint --iters 600
    python tools/convergence_run2.py --family smoke --iters 600

Writes output/convergence/<family>_curve.json + <family>_metric.json.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NUS_CLASSES = ["car", "truck", "construction_vehicle", "bus", "trailer",
               "barrier", "motorcycle", "bicycle", "pedestrian",
               "traffic_cone"]
NUS_SIZES = [(1.95, 4.60, 1.73), (2.51, 6.93, 2.84), (2.82, 6.37, 3.19),
             (2.94, 10.5, 3.47), (2.90, 12.29, 3.87), (2.53, 0.50, 0.98),
             (0.77, 2.11, 1.47), (0.60, 1.70, 1.28), (0.67, 0.73, 1.77),
             (0.41, 0.41, 1.07)]
NUS_PC_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--family", required=True,
                   choices=["centerpoint", "smoke", "petr"])
    p.add_argument("--iters", type=int, default=600)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--save_dir", default="output/convergence")
    p.add_argument("--device", default=None)
    return p.parse_args()


def _setup(args):
    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    os.makedirs(args.save_dir, exist_ok=True)
    return jax


def _train(model, step, optimizer, batches, iters, save_path, batch_of):
    import jax
    rng = np.random.default_rng(0)
    curve = []
    t0 = time.time()
    for it in range(iters):
        losses = step(model, optimizer, batch_of(rng))
        loss = float(jax.device_get(losses["loss"]))
        curve.append(loss)
        if it % 25 == 0 or it == iters - 1:
            print("iter {:4d} loss {:.4f} ({:.1f}s)".format(
                it, loss, time.time() - t0), flush=True)
    with open(save_path, "w") as f:
        json.dump({"loss": curve, "iters": iters,
                   "wall_s": time.time() - t0}, f)
    return curve


def run_centerpoint(args):
    jax = _setup(args)
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from paddle3d_tpu.apis import Config
    from paddle3d_tpu.apis.pipeline import make_train_step
    from paddle3d_tpu.datasets.synthetic import SyntheticDataset
    from paddle3d_tpu.datasets.nuscenes.nuscenes_metric import NuScenesMetric
    from paddle3d_tpu.geometries import BBoxes3D
    from paddle3d_tpu.sample import Sample

    cfg = Config(path="configs/centerpoint/"
                      "centerpoint_pillars_02voxel_nuscenes_10sweep.yml")
    model = cfg.model
    model.train()
    optimizer = nnx.Optimizer(
        model, optax.adamw(optax.cosine_decay_schedule(args.lr, args.iters)),
        wrt=nnx.Param)
    step = make_train_step(grad_clip_norm=35.0, amp_level="O2")

    n_pts, g = 60000, 12
    train_ds = SyntheticDataset(
        num_samples=256, num_points=n_pts, max_boxes=g,
        point_cloud_range=NUS_PC_RANGE, class_sizes=NUS_SIZES,
        point_dim=5, with_velocity=True, mode="train", seed=1)
    val_ds = SyntheticDataset(
        num_samples=32, num_points=n_pts, max_boxes=g,
        point_cloud_range=NUS_PC_RANGE, class_sizes=NUS_SIZES,
        point_dim=5, with_velocity=True, mode="val", seed=9)

    def batch_from(ds, idxs):
        pts = np.zeros((len(idxs), n_pts, 5), np.float32)
        boxes = np.zeros((len(idxs), g, 9), np.float32)
        labels = np.full((len(idxs), g), -1, np.int32)
        for i, idx in enumerate(idxs):
            p, b, l = ds._gen(int(idx))
            pts[i] = p
            boxes[i, :len(b)] = b
            labels[i, :len(l)] = l
        return {"data": jnp.asarray(pts), "gt_boxes": jnp.asarray(boxes),
                "gt_labels": jnp.asarray(labels)}

    def batch_of(rng):
        return batch_from(train_ds, rng.integers(0, len(train_ds),
                                                 args.batch))

    _train(model, step, optimizer, None, args.iters,
           os.path.join(args.save_dir, "centerpoint_curve.json"), batch_of)

    # ---- eval through the real NDS evaluator
    model.eval()
    graphdef, state = nnx.split(model)
    f = jax.jit(lambda s, p: nnx.merge(graphdef, s).test_forward(
        {"data": p}))

    class _DS:
        class_names = NUS_CLASSES
        sample_tokens = list(range(len(val_ds)))

        def annotations(self, token):
            _, b, l = val_ds._gen(int(token))
            names = [NUS_CLASSES[i] for i in l]
            attrs = []
            for nm, bb in zip(names, b):
                attrs.append({"car": "vehicle.parked",
                              "truck": "vehicle.parked",
                              "bus": "vehicle.parked",
                              "construction_vehicle": "vehicle.parked",
                              "trailer": "vehicle.parked",
                              "motorcycle": "cycle.without_rider",
                              "bicycle": "cycle.without_rider",
                              "pedestrian": "pedestrian.standing",
                              }.get(nm, ""))
            return (b, l, names, np.full(len(b), 50), attrs)

    metric = NuScenesMetric(_DS())
    for start in range(0, len(val_ds), args.batch):
        idxs = list(range(start, min(start + args.batch, len(val_ds))))
        pad = idxs + [idxs[-1]] * (args.batch - len(idxs))
        out = jax.device_get(f(state, batch_from(val_ds, pad)["data"]))
        for k, token in enumerate(idxs):
            sel = out["scores"][k] > 0.05
            bx = out["box3d_lidar"][k][sel]
            s = Sample(path=None, modality="lidar")
            s.meta.id = token
            s.bboxes_3d = BBoxes3D(
                bx[:, :7], origin=[.5, .5, .5],
                velocities=bx[:, 7:9] if bx.shape[1] > 7 else None)
            s.labels = out["label_preds"][k][sel].astype(np.int64)
            s.confidences = out["scores"][k][sel]
            metric.update([s])
    res = metric.compute(verbose=True)
    flat = {k: (round(float(v), 4) if np.isscalar(v) or
                isinstance(v, (float, int)) else v)
            for k, v in res.items() if k in ("mAP", "NDS", "mATE", "mASE",
                                             "mAOE", "mAVE", "mAAE")}
    with open(os.path.join(args.save_dir, "centerpoint_metric.json"),
              "w") as fo:
        json.dump(flat, fo, indent=1)
    print(json.dumps(flat, indent=1))


def run_smoke(args):
    jax = _setup(args)
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from paddle3d_tpu.apis import Config
    from paddle3d_tpu.apis.pipeline import make_train_step
    from paddle3d_tpu.datasets.kitti.eval import kitti_eval
    from paddle3d_tpu.datasets.synthetic import SyntheticMonoDataset
    from paddle3d_tpu.transforms import Gt2SmokeTarget

    cfg = Config(path="configs/smoke/smoke_dla34_no_dcn_kitti.yml")
    model = cfg.model
    model.train()
    optimizer = nnx.Optimizer(
        model, optax.adamw(optax.cosine_decay_schedule(args.lr, args.iters)),
        wrt=nnx.Param)
    step = make_train_step(grad_clip_norm=10.0, amp_level="O2")

    h, w = 384, 1280
    tg = Gt2SmokeTarget(mode="train", num_classes=3, flip_prob=0.0,
                        max_objs=30, input_size=[w, h],
                        output_stride=[4, 4])
    ds = SyntheticMonoDataset(num_samples=16, image_hw=(h, w), max_boxes=3,
                              mode="train", seed=3, transforms=[tg])

    def collate(idxs):
        samples = [ds[int(i)] for i in idxs]
        batch, _ = ds.collate_fn(samples)
        return jax.tree.map(jnp.asarray, batch)

    def batch_of(rng):
        return collate(rng.integers(0, len(ds), args.batch))

    _train(model, step, optimizer, None, args.iters,
           os.path.join(args.save_dir, "smoke_curve.json"), batch_of)

    # ---- overfit eval on the SAME fixed scenes through the real KITTI
    # evaluator. The synthetic scenes are projectively-consistent rendered
    # cuboids (r5), so the regression targets are learnable from pixels;
    # the heatmap confidence still ramps slowly under the focal loss, so
    # the eval drops the deploy-time 0.25 gate — AP ranks by score anyway.
    model.eval()
    model.det_threshold = 0.01
    graphdef, state = nnx.split(model)
    import pickle
    with open(os.path.join(args.save_dir, "smoke_params.pkl"), "wb") as fp:
        pickle.dump(jax.device_get(state), fp)
    tg_val = Gt2SmokeTarget(mode="val", num_classes=3, flip_prob=0.0,
                            max_objs=30, input_size=[w, h],
                            output_stride=[4, 4])
    # SAME scene parameters as training (max_boxes changes the per-index
    # RNG stream, so a different value evaluates UNSEEN scenes — the r5
    # 0.0-AP run was exactly that bug: trained on max_boxes=3 scenes,
    # scored on max_boxes=4 ones).
    ds_val = SyntheticMonoDataset(num_samples=16, image_hw=(h, w),
                                  max_boxes=3, mode="train", seed=3,
                                  transforms=[tg_val])
    f = jax.jit(lambda s, b: nnx.merge(graphdef, s).test_forward(b))
    gt_annos, dt_annos = [], []

    def anno_from(boxes_cam, scores=None):
        n = len(boxes_cam)
        anno = {
            "name": np.array(["Car"] * n),
            "truncated": np.zeros(n, np.float32),
            "occluded": np.zeros(n, np.float32),
            "alpha": np.zeros(n, np.float32),
            "bbox": np.tile(np.array([[100., 100., 300., 180.]],
                                     np.float32), (n, 1)),
            "dimensions": boxes_cam[:, 3:6][:, [2, 0, 1]],  # l,h,w order
            "location": boxes_cam[:, :3],
            "rotation_y": boxes_cam[:, 6],
        }
        if scores is not None:
            anno["score"] = np.asarray(scores, np.float32)
        return anno

    for start in range(0, len(ds_val), args.batch):
        idxs = list(range(start, min(start + args.batch,
                                     len(ds_val))))
        pad = idxs + [idxs[-1]] * (args.batch - len(idxs))
        batch = collate_val(ds_val, pad, jnp)
        out = jax.device_get(f(state, batch))
        for k, i in enumerate(idxs):
            _, gb, _ = ds_val._gen(int(i))
            gt_annos.append(anno_from(gb))
            sel = out["scores"][k] >= 0.02
            dt_annos.append(anno_from(out["box3d_cam"][k][sel],
                                      out["scores"][k][sel]))
    with open(os.path.join(args.save_dir, "smoke_annos.pkl"), "wb") as fp:
        pickle.dump({"gt": gt_annos, "dt": dt_annos}, fp)
    res = kitti_eval(gt_annos, dt_annos, ["Car"], metrics=(1, 2))
    flat = {}
    for m in ("bev", "3d"):
        for d in ("easy", "moderate", "hard"):
            ap11, ap40 = res["Car"][m][d]
            flat["{}_{}_ap40".format(m, d)] = round(ap40, 2)
    flat["note"] = ("overfit evidence on the fixed synthetic train set of "
                    "projectively-consistent rendered cuboids (r5 fixture; "
                    "separation-sampled centers)")
    with open(os.path.join(args.save_dir, "smoke_metric.json"), "w") as fo:
        json.dump(flat, fo, indent=1)
    print(json.dumps(flat, indent=1))


def collate_val(ds, idxs, jnp):
    import jax
    samples = [ds[int(i)] for i in idxs]
    batch, _ = ds.collate_fn(samples)
    return jax.tree.map(jnp.asarray, batch)


def run_petr(args):
    """Overfit PETR (multi-view transformer) on structured synthetic MV
    scenes and score through the devkit-faithful NDS evaluator — the first
    MV-camera convergence evidence (VERDICT r4 missing #1 / next #4)."""
    jax = _setup(args)
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from paddle3d_tpu.apis import Config
    from paddle3d_tpu.apis.pipeline import make_train_step
    from paddle3d_tpu.datasets.nuscenes.nuscenes_metric import NuScenesMetric
    from paddle3d_tpu.datasets.synthetic import SyntheticMVDataset
    from paddle3d_tpu.geometries import BBoxes3D
    from paddle3d_tpu.sample import Sample

    cfg = Config(path="configs/petr/petr_vovnet_gridmask_p4_800x320.yml")
    model = cfg.model
    model.train()
    optimizer = nnx.Optimizer(
        model, optax.adamw(optax.cosine_decay_schedule(2e-4, args.iters)),
        wrt=nnx.Param)
    step = make_train_step(grad_clip_norm=35.0, amp_level="O2")

    h, w, ncam = 320, 800, 6
    classes = ["car", "truck", "bus"]
    ds = SyntheticMVDataset(num_samples=24, num_cams=ncam, image_hw=(h, w),
                            max_boxes=4, mode="train", seed=5)
    l2i, i2l = ds._mats()
    gmax = ds.max_boxes

    def batch_from(idxs):
        imgs = np.zeros((len(idxs), ncam, h, w, 3), np.float32)
        boxes = np.zeros((len(idxs), gmax, 9), np.float32)
        labels = np.full((len(idxs), gmax), -1, np.int32)
        for i, idx in enumerate(idxs):
            im, b, l = ds._gen(int(idx))
            imgs[i] = im / 255.0
            boxes[i, :len(b)] = b
            labels[i, :len(l)] = l
        return {"img": jnp.asarray(imgs),
                "img2lidars": jnp.asarray(
                    np.tile(i2l[None], (len(idxs), 1, 1, 1))),
                "gt_boxes": jnp.asarray(boxes),
                "gt_labels": jnp.asarray(labels)}

    def batch_of(rng):
        return batch_from(rng.integers(0, len(ds), args.batch))

    _train(model, step, optimizer, None, args.iters,
           os.path.join(args.save_dir, "petr_curve.json"), batch_of)

    model.eval()
    graphdef, state = nnx.split(model)
    f = jax.jit(lambda s, b: nnx.merge(graphdef, s).test_forward(
        {"img": b["img"], "img2lidars": b["img2lidars"]}))

    class _DS:
        class_names = classes
        sample_tokens = list(range(len(ds)))

        def annotations(self, token):
            _, b, l = ds._gen(int(token))
            names = [classes[i] for i in l]
            attrs = ["vehicle.parked"] * len(b)
            return (b, l, names, np.full(len(b), 50), attrs)

    metric = NuScenesMetric(_DS())
    for start in range(0, len(ds), args.batch):
        idxs = list(range(start, min(start + args.batch, len(ds))))
        pad = idxs + [idxs[-1]] * (args.batch - len(idxs))
        out = jax.device_get(f(state, batch_from(pad)))
        for k, token in enumerate(idxs):
            sel = out["scores"][k] > 0.05
            bx = out["box3d_lidar"][k][sel]
            s = Sample(path=None, modality="multiview")
            s.meta.id = token
            s.bboxes_3d = BBoxes3D(
                bx[:, :7], origin=[.5, .5, .5],
                velocities=bx[:, 7:9] if bx.shape[1] > 7 else None)
            s.labels = out["label_preds"][k][sel].astype(np.int64)
            s.confidences = out["scores"][k][sel]
            metric.update([s])
    res = metric.compute(verbose=True)
    flat = {k: round(float(v), 4)
            for k, v in res.items() if k in ("mAP", "NDS", "mATE", "mASE",
                                             "mAOE", "mAVE", "mAAE")}
    flat["note"] = ("overfit evidence on the fixed structured synthetic "
                    "MV train set (projectively consistent rendered "
                    "cuboids)")
    with open(os.path.join(args.save_dir, "petr_metric.json"), "w") as fo:
        json.dump(flat, fo, indent=1)
    print(json.dumps(flat, indent=1))


def main():
    args = parse_args()
    if args.family == "centerpoint":
        run_centerpoint(args)
    elif args.family == "petr":
        run_petr(args)
    else:
        run_smoke(args)


if __name__ == "__main__":
    main()
