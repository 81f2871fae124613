"""Training/eval entry point — the reference's `python train.py` preserved
(reference train.py:545-560: dispatch on config phase).

Unlike the reference (which takes no CLI args and hardcodes a config
singleton), flags can override any Config field:
    python train.py --phase train --dataset dexycb --batch_size 64
"""

import argparse
import dataclasses


def parse_config():
    from keypointfusion_tpu.config import Config
    parser = argparse.ArgumentParser()
    def str2bool(v):
        return str(v).lower() in ('1', 'true', 'yes', 'y')

    for f in dataclasses.fields(Config):
        if isinstance(f.default, bool):
            parser.add_argument(f'--{f.name}', type=str2bool,
                                default=f.default)
        elif isinstance(f.default, (str, int, float)):
            parser.add_argument(f'--{f.name}', type=type(f.default),
                                default=f.default)
    args = parser.parse_args()
    return Config(**vars(args))


def main():
    from keypointfusion_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    cfg = parse_config()
    from keypointfusion_tpu.training.trainer import Trainer
    trainer = Trainer(cfg)
    if cfg.phase == 'train':
        trainer.train()
    elif cfg.phase == 'test':
        trainer.test()
    elif cfg.phase == 'eval':
        trainer.evaluation()
    else:
        raise ValueError(f'unknown phase {cfg.phase}')


if __name__ == '__main__':
    main()
