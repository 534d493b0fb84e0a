"""Model graph visualization (reference: tools/graphvis.py).

Prints the nnx module tree with parameter shapes/counts and optionally
writes a graphviz .dot of the module hierarchy.

    python tools/graphvis.py --config configs/.../x.yml [--dot model.dot]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", dest="cfg", required=True)
    p.add_argument("--dot", default=None, help="write graphviz dot here")
    p.add_argument("--max_depth", type=int, default=4)
    return p.parse_args()


def module_tree(model, max_depth):
    """-> list of (path, type_name, n_params) rows + dot edges."""
    import numpy as np
    from flax import nnx
    from jax import tree_util

    def jax_tree_leaves(t):
        return tree_util.tree_leaves(t)

    rows, edges = [], []

    def n_params(m):
        leaves = jax_tree_leaves(nnx.state(m, nnx.Param))
        return sum(int(np.prod(v.shape)) for v in leaves
                   if hasattr(v, "shape"))

    def walk(mod, path, depth):
        rows.append((path or "model", type(mod).__name__, n_params(mod)))
        if depth >= max_depth:
            return
        for name, attr in vars(mod).items():
            children = []
            if isinstance(attr, nnx.Module):
                children = [(name, attr)]
            elif isinstance(attr, nnx.List):
                children = [("{}[{}]".format(name, i), it)
                            for i, it in enumerate(attr)
                            if isinstance(it, nnx.Module)]
            for cname, child in children:
                cpath = "{}.{}".format(path, cname) if path else cname
                edges.append((path or "model", cpath))
                walk(child, cpath, depth + 1)

    walk(model, "", 0)
    return rows, edges


def main():
    args = parse_args()
    from paddle3d_tpu.apis import Config
    from paddle3d_tpu.utils.logger import logger

    cfg = Config(path=args.cfg)
    model = cfg.model
    rows, edges = module_tree(model, args.max_depth)
    total = rows[0][2]
    for path, tname, n in rows:
        depth = path.count(".") + (0 if path == "model" else 1)
        logger.info("{}{} ({}) params={:,}".format(
            "  " * depth, path.split(".")[-1], tname, n))
    logger.info("TOTAL parameters: {:,}".format(total))

    if args.dot:
        with open(args.dot, "w") as f:
            f.write("digraph model {\n  rankdir=LR;\n")
            for path, tname, n in rows:
                f.write('  "{}" [label="{}\\n{}\\n{:,} params"];\n'.format(
                    path, path.split(".")[-1], tname, n))
            for a, b in edges:
                f.write('  "{}" -> "{}";\n'.format(a, b))
            f.write("}\n")
        logger.info("Wrote {}".format(args.dot))


if __name__ == "__main__":
    main()
