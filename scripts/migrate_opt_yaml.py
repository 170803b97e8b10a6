#!/usr/bin/env python
"""Strip stale keys from pretrained opt.yaml files (the reference keeps
this as a scratch notebook, tester.ipynb).

Usage: python scripts/migrate_opt_yaml.py <opt.yaml> [<opt.yaml> ...]
"""

import sys

sys.path.insert(0, ".")

from p2p_bridge_tpu.utils.config import Config

STALE_KEYS = [
    "gpu", "local_rank", "global_size", "global_rank", "dist_url",
    "ngpus_per_node", "rank", "sync_bn", "outf_syn",
]


def migrate(path: str) -> None:
    cfg = Config.load(path)
    removed = []
    for key in STALE_KEYS:
        if key in cfg:
            del cfg._data[key]
            removed.append(key)
    cfg.save(path)
    print(f"{path}: removed {removed or 'nothing'}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        migrate(p)
