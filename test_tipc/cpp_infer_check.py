"""TIPC cpp-infer leg: run the exported weight-BAKED StableHLO module
through the C++ PJRT runner (deploy/cpp/pjrt_runner) and require its raw
outputs to match the Python deploy path (config + msgpack weights) within
--atol. The reference certifies its per-model C++ TRT runners the same way
(test_tipc/test_inference_cpp.sh).

    python test_tipc/cpp_infer_check.py --export_dir out/export \
        --runner deploy/cpp/pjrt_runner --plugin /opt/axon/libaxon_pjrt.so
"""
import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def flat_specs(specs, prefix=()):
    """Flatten nested input specs in jax pytree (sorted-key) order."""
    out = []
    for k in sorted(specs):
        v = specs[k]
        if "shape" in v and "dtype" in v:
            out.append(("/".join(prefix + (k,)), v))
        else:
            out.extend(flat_specs(v, prefix + (k,)))
    return out


def build_inputs(specs, rng):
    vals = {}
    for k in sorted(specs):
        v = specs[k]
        if "shape" in v and "dtype" in v:
            if "int" in v["dtype"]:
                vals[k] = rng.integers(
                    0, 4, v["shape"]).astype(v["dtype"])
            else:
                vals[k] = rng.uniform(
                    -1, 1, v["shape"]).astype(v["dtype"])
        else:
            vals[k] = build_inputs(v, rng)
    return vals


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--export_dir", required=True)
    p.add_argument("--runner", default="deploy/cpp/pjrt_runner")
    p.add_argument("--plugin", default="/opt/axon/libaxon_pjrt.so")
    p.add_argument("--atol", type=float, default=1e-3)
    args = p.parse_args()

    with open(os.path.join(args.export_dir, "export_meta.yaml")) as f:
        meta = yaml.safe_load(f)
    specs = meta["inputs"]
    rng = np.random.default_rng(123)
    inputs = build_inputs(specs, rng)

    # ---- reference outputs through the Python deploy path
    import jax
    from flax import nnx, serialization

    from paddle3d_tpu.apis import Config
    cfg = Config(path=meta["config"])
    model = cfg.model
    template = nnx.state(model, nnx.Param)
    with open(os.path.join(args.export_dir, "model.msgpack"), "rb") as f:
        pure = serialization.from_bytes(template.to_pure_dict(), f.read())
    template.replace_by_pure_dict(pure)
    nnx.update(model, template)
    model.eval()
    graphdef, state = nnx.split(model)

    def fwd(state, batch):
        m = nnx.merge(graphdef, state)
        return m.export_forward(batch)

    ref = jax.jit(fwd)(state, inputs)
    ref_leaves = jax.tree.leaves(ref)

    # ---- C++ PJRT runner on the baked module
    tmp = tempfile.mkdtemp(prefix="tipc_cpp_")
    cmd = [args.runner, "--plugin", args.plugin,
           "--model", os.path.join(args.export_dir,
                                   "model_baked.stablehlo.mlir"),
           "--output", os.path.join(tmp, "out")]
    for name, spec in flat_specs(specs):
        leaf = inputs
        for part in name.split("/"):
            leaf = leaf[part]
        path = os.path.join(tmp, name.replace("/", "_") + ".bin")
        np.asarray(leaf).tofile(path)
        cmd += ["--input", path,
                "--input_shape", ",".join(map(str, spec["shape"])),
                "--input_dtype", spec["dtype"].replace("float32", "f32")
                .replace("int32", "s32").replace("int64", "s64")
                .replace("float16", "f16")]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)

    got_leaves = [
        np.fromfile(os.path.join(tmp, "out.{}.bin".format(i)),
                    dtype=np.asarray(r).dtype).reshape(np.asarray(r).shape)
        for i, r in enumerate(ref_leaves)
    ]

    if isinstance(ref, dict) and {"scores", "box3d_lidar"} <= set(ref):
        # detection outputs: equal-score candidates may land in a
        # different top-k ORDER under a different compilation of the same
        # program — compare as a SET (greedy nearest-box matching over
        # valid rows), like the reference's TRT checks
        got = dict(zip(sorted(ref), got_leaves))
        worst = 0.0
        rb = np.asarray(ref["box3d_lidar"], np.float64)
        gb = np.asarray(got["box3d_lidar"], np.float64)
        rs = np.asarray(ref["scores"], np.float64)
        gs = np.asarray(got["scores"], np.float64)
        for bi in range(rb.shape[0]):
            rv = rs[bi] >= 0
            gv = gs[bi] >= 0
            assert int(rv.sum()) == int(gv.sum()), "valid counts differ"
            ro = np.argsort(-rs[bi][rv])
            go = np.argsort(-gs[bi][gv])
            rsc, gsc = rs[bi][rv][ro], gs[bi][gv][go]
            rset, gset = rb[bi][rv][ro], gb[bi][gv][go]
            # sorted score lists must agree exactly (set equality)
            if len(rsc):
                worst = max(worst, float(np.abs(rsc - gsc).max()))
            # boxes compared only where the score is UNIQUE: equal-score
            # candidates (distinct anchors, coincidental ties of a
            # barely-trained smoke model) are interchangeable under
            # top-k tie-breaking across two compilations
            for k in range(len(rsc)):
                tied = np.abs(rsc - rsc[k]) <= args.atol
                if int(tied.sum()) == 1:
                    worst = max(worst,
                                float(np.abs(rset[k] - gset[k]).max()))
        print("  set-matched {} detections, max |diff| {:.3e}".format(
            int(rv.sum()), worst))
    else:
        worst = 0.0
        for i, r in enumerate(ref_leaves):
            r = np.asarray(r)
            g = got_leaves[i]
            if np.issubdtype(r.dtype, np.floating):
                d = float(np.max(np.abs(g.astype(np.float64) -
                                        r.astype(np.float64))))
            else:
                d = float(np.max(np.abs(g.astype(np.int64) -
                                        r.astype(np.int64))))
            worst = max(worst, d)
            print("  output {}: shape {} max|diff| {:.3e}".format(
                i, r.shape, d))
    assert worst <= args.atol, (
        "cpp runner outputs diverge: {} > {}".format(worst, args.atol))
    print("cpp infer consistency OK (max |diff| {:.3e})".format(worst))


if __name__ == "__main__":
    main()
