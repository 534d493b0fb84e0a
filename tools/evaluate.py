"""Evaluation CLI (reference: tools/evaluate.py).

    python tools/evaluate.py --config cfg.yml [--model path/to/model.msgpack]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    parser = argparse.ArgumentParser(description="Model evaluation")
    parser.add_argument("--config", dest="cfg", required=True, type=str)
    parser.add_argument("--device", type=str, default=None,
                        help="tpu|cpu override (reference tools use --device)")
    parser.add_argument("--model", type=str, default=None,
                        help="checkpoint dir or model.msgpack file")
    parser.add_argument("--batch_size", type=int, default=None)
    return parser.parse_args()


def main(args):
    if args.device is not None:
        import jax
        jax.config.update("jax_platforms", args.device)
    import jax
    from flax import nnx, serialization

    from paddle3d_tpu.apis import Config, Trainer
    from paddle3d_tpu.utils.logger import logger

    cfg = Config(path=args.cfg, batch_size=args.batch_size)
    model = cfg.model

    if args.model is not None:
        path = args.model
        if os.path.isdir(path):
            path = os.path.join(path, "model.msgpack")
        template = nnx.state(model, nnx.Param)
        with open(path, "rb") as f:
            pure = serialization.from_bytes(template.to_pure_dict(), f.read())
        template.replace_by_pure_dict(pure)
        nnx.update(model, template)
        logger.info("Loaded weights from {}".format(path))

    trainer = Trainer(
        model=model,
        optimizer=cfg.optimizer,
        iters=0,
        val_dataset=cfg.val_dataset,
        batch_size=cfg.batch_size)
    metrics = trainer.evaluate()
    logger.info("Evaluation results: {}".format(metrics))


if __name__ == "__main__":
    main(parse_args())
