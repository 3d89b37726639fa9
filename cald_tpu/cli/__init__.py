"""Command-line front end: one driver, reference-compatible flags.

The reference duplicates ~30 argparse flags across 7 entry scripts
(cald_train.py / random_train.py / ll_train.py / vaal_train.py / ssm_train.py /
lt_c_train.py / ls_c_train.py — SURVEY.md §2.5); here a single structured
``ALConfig`` + ``--strategy`` flag covers all of them:

    python -m cald_tpu.cli.main --dataset voc2007 --data-path /data/VOCdevkit \
        --model faster --strategy cald --augs FCDR -bp 1.3 -mr 1.2
"""

from cald_tpu.cli.config import ALConfig, build_config_from_args, make_parser
from cald_tpu.cli.driver import al_loop

__all__ = ["ALConfig", "make_parser", "build_config_from_args", "al_loop"]
