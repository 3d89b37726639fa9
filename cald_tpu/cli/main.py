"""Entry point: ``python -m cald_tpu.cli.main --dataset ... --strategy ...``."""

from __future__ import annotations

import json
import sys

from cald_tpu.cli.config import build_config_from_args
from cald_tpu.cli.driver import al_loop


def main(argv=None):
    cfg = build_config_from_args(argv)
    print(cfg)
    history = al_loop(cfg)
    print(json.dumps(
        [{k: (v if not isinstance(v, dict)
              else {kk: vv for kk, vv in v.items() if not isinstance(vv, dict)})
          for k, v in h.items()} for h in history],
        default=float, indent=1))
    return history


if __name__ == "__main__":
    main(sys.argv[1:])
