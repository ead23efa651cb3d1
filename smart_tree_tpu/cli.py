"""`run-smart-tree` CLI — parity with reference smart_tree/cli.py:10-26:

    run-smart-tree +path=cloud.ply
    run-smart-tree +directory=clouds/ pipeline.save_outputs=True
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

from .utils.configs import compose, default_conf_dir, instantiate


def main(argv=None) -> int:
    import logging

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    argv = list(sys.argv[1:] if argv is None else argv)
    config = default_conf_dir() / "pipeline.yaml"
    # allow --config-path style override, hydra-ish
    overrides = []
    for a in argv:
        if a.startswith("--config="):
            config = Path(a.split("=", 1)[1])
        else:
            overrides.append(a)
    cfg = compose(config, overrides)
    pipeline = instantiate(cfg["pipeline"])

    if "path" in cfg:
        pipeline.process_cloud(Path(cfg["path"]))
    elif "directory" in cfg:
        for p in sorted(os.listdir(cfg["directory"])):
            pipeline.process_cloud(Path(cfg["directory"]) / p)
    else:
        print("Please supply a path or directory to point clouds "
              "(+path=... or +directory=...).")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
