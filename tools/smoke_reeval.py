"""Re-score a saved SMOKE convergence checkpoint (smoke_params.pkl)
through the KITTI evaluator without retraining — used to separate
train-convergence failures from eval-leg bugs (the r5 0.0-AP artifact
was an eval-leg bug: the val dataset's max_boxes differed from training,
which reseeds every scene).

    python tools/smoke_reeval.py [--params output/convergence/smoke_params.pkl]
"""
import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--params", default="output/convergence/smoke_params.pkl")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out", default="output/convergence/smoke_metric.json")
    p.add_argument("--device", default=None)
    args = p.parse_args()

    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    from flax import nnx

    from paddle3d_tpu.apis import Config
    from paddle3d_tpu.datasets.kitti.eval import kitti_eval
    from paddle3d_tpu.datasets.synthetic import SyntheticMonoDataset
    from paddle3d_tpu.transforms import Gt2SmokeTarget
    from convergence_run2 import collate_val

    cfg = Config(path="configs/smoke/smoke_dla34_no_dcn_kitti.yml")
    model = cfg.model
    model.eval()
    model.det_threshold = 0.01
    graphdef, _ = nnx.split(model)
    with open(args.params, "rb") as fp:
        state = pickle.load(fp)

    h, w = 384, 1280
    tg_val = Gt2SmokeTarget(mode="val", num_classes=3, flip_prob=0.0,
                            max_objs=30, input_size=[w, h],
                            output_stride=[4, 4])
    # identical scene parameters to the training dataset in
    # convergence_run2.run_smoke — same max_boxes/seed => same scenes
    ds_val = SyntheticMonoDataset(num_samples=16, image_hw=(h, w),
                                  max_boxes=3, mode="train", seed=3,
                                  transforms=[tg_val])
    f = jax.jit(lambda s, b: nnx.merge(graphdef, s).test_forward(b))

    def anno_from(boxes_cam, scores=None):
        n = len(boxes_cam)
        anno = {
            "name": np.array(["Car"] * n),
            "truncated": np.zeros(n, np.float32),
            "occluded": np.zeros(n, np.float32),
            "alpha": np.zeros(n, np.float32),
            "bbox": np.tile(np.array([[100., 100., 300., 180.]],
                                     np.float32), (n, 1)),
            "dimensions": boxes_cam[:, 3:6][:, [2, 0, 1]],
            "location": boxes_cam[:, :3],
            "rotation_y": boxes_cam[:, 6],
        }
        if scores is not None:
            anno["score"] = np.asarray(scores, np.float32)
        return anno

    gt_annos, dt_annos = [], []
    for start in range(0, len(ds_val), args.batch):
        idxs = list(range(start, min(start + args.batch, len(ds_val))))
        pad = idxs + [idxs[-1]] * (args.batch - len(idxs))
        batch = collate_val(ds_val, pad, jnp)
        out = jax.device_get(f(state, batch))
        for k, i in enumerate(idxs):
            _, gb, _ = ds_val._gen(int(i))
            gt_annos.append(anno_from(gb))
            sel = out["scores"][k] >= 0.02
            dt_annos.append(anno_from(out["box3d_cam"][k][sel],
                                      out["scores"][k][sel]))
    with open(os.path.join(os.path.dirname(args.out),
                           "smoke_annos.pkl"), "wb") as fp:
        pickle.dump({"gt": gt_annos, "dt": dt_annos}, fp)
    res = kitti_eval(gt_annos, dt_annos, ["Car"], metrics=(1, 2))
    flat = {}
    for m in ("bev", "3d"):
        for d in ("easy", "moderate", "hard"):
            _, ap40 = res["Car"][m][d]
            flat["{}_{}_ap40".format(m, d)] = round(ap40, 2)
    flat["note"] = ("overfit evidence on the fixed synthetic train set of "
                    "projectively-consistent rendered cuboids (r5 fixture; "
                    "separation-sampled centers)")
    with open(args.out, "w") as fo:
        json.dump(flat, fo, indent=1)
    print(json.dumps(flat, indent=1))


if __name__ == "__main__":
    main()
