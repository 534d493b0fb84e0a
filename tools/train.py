"""Training CLI (reference: tools/train.py).

    python tools/train.py --config configs/.../x.yml [--iters N] [--resume]
"""
import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    parser = argparse.ArgumentParser(description="Model training")
    parser.add_argument("--config", dest="cfg", required=True, type=str)
    parser.add_argument("--device", type=str, default=None,
                        help="tpu|cpu override (reference tools use --device)")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--iters", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--learning_rate", type=float, default=None)
    parser.add_argument("--save_dir", type=str, default="output")
    parser.add_argument("--save_interval", type=int, default=1000)
    parser.add_argument("--log_interval", type=int, default=10)
    parser.add_argument("--keep_checkpoint_max", type=int, default=5)
    parser.add_argument("--do_eval", action="store_true")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--ema_decay", type=float, default=None)
    parser.add_argument("--profiler_options", type=str, default=None,
                        help="'batch_range=[10,20];output_dir=...' — jax "
                             "trace window (reference --profiler_options)")
    parser.add_argument("--num_workers", type=int, default=4,
                        help="dataloader worker threads")
    parser.add_argument("--quant_config", type=str, default=None,
                        help="quant YAML (reference tools/train.py "
                             "--quant_config): enables QAT fake-quant")
    return parser.parse_args()


def main(args):
    if args.device is not None:
        import jax
        jax.config.update("jax_platforms", args.device)
    from paddle3d_tpu.apis import Config, Trainer
    from paddle3d_tpu.utils.logger import logger

    if args.seed is not None:
        random.seed(args.seed)
        np.random.seed(args.seed)

    cfg = Config(
        path=args.cfg, batch_size=args.batch_size, iters=args.iters,
        epochs=args.epochs, learning_rate=args.learning_rate)

    if args.quant_config is not None:
        # QAT injection + finetune-schedule merge (reference:
        # tools/train.py:206-209 build_slim_model + update_dic)
        from paddle3d_tpu.slim.quant import QAT, get_qat_config, update_dic
        slim_dic = get_qat_config(args.quant_config)
        update_dic(cfg.dic, slim_dic.get("finetune_config", {}))
        # explicit CLI overrides still win over the finetune schedule
        cfg.update(batch_size=args.batch_size, iters=args.iters,
                   epochs=args.epochs, learning_rate=args.learning_rate)
    logger.info("Config loaded:\n{}".format(cfg))

    model = cfg.model
    if args.quant_config is not None:
        qat = QAT(slim_dic["quant_config"])
        model = qat.quantize(model)
        logger.info("QAT enabled: {}".format(qat.config))

    trainer = Trainer(
        model=model,
        optimizer=cfg.optimizer,
        iters=cfg.iters,
        epochs=cfg.epochs,
        train_dataset=cfg.train_dataset,
        val_dataset=cfg.val_dataset if args.do_eval else None,
        batch_size=cfg.batch_size,
        save_dir=args.save_dir,
        save_interval=args.save_interval,
        log_interval=args.log_interval,
        keep_checkpoint_max=args.keep_checkpoint_max,
        do_eval=args.do_eval,
        resume=args.resume,
        ema_decay=args.ema_decay,
        ema_cfg=cfg.ema_cfg,
        amp_cfg=cfg.amp_cfg,
        grad_clip_norm=cfg.dic.get("optimizer", {}).get("grad_clip_norm"),
        profiler_options=args.profiler_options,
        dataloader_fn={"num_workers": args.num_workers},
    )
    trainer.train()


if __name__ == "__main__":
    main(parse_args())
