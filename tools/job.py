"""Cluster job entry point — the north rule's ``ray job submit`` surface.

On a real cluster::

    ray job submit --working-dir . -- \
        python tools/job.py --sf-dir /data/tokenized --root /shared/out \
            --epochs 64 --num-shards 64

The job attaches to the cluster it was submitted to (``ray.init()`` with no
address resolves the cluster under ``ray job submit``; standalone runs get a
local session).  ``--root`` must be shared storage: shard actors and sink
writers live on arbitrary nodes.  Re-submitting with the same ``--root``
resumes from the last checkpoint and skips committed epochs (exactly-once).

The two-cluster-size scaling criterion (N vs 4N nodes, efficiency ≥ 0.8) is
this same job submitted to both clusters; in the single-node sandbox the
equivalent evidence is ``python bench.py --scaling`` (two parallelism levels
in fresh sessions — see BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable both via `ray job submit --working-dir .` and directly from the
# repo checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--root", required=True,
                    help="shared output root (sink + checkpoints)")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--no-window", action="store_true")
    ap.add_argument("--sync-every", type=int, default=1,
                    help="group-commit barrier cadence (K epochs per "
                         "fsync barrier + durable watermark; 1 = fsync "
                         "every epoch)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():  # ray job submit provides the cluster
        ray.init(ignore_reinit_error=True)

    from diffdataflowmlpipelines_ray.pipelines.flagship import run_flagship

    t0 = time.perf_counter()
    res = run_flagship(
        args.sf_dir, args.root, n_epochs=args.epochs,
        num_shards=args.num_shards, replicate=args.replicate,
        parallelism=args.parallelism, window_agg=not args.no_window,
        sync_every=args.sync_every,
    )
    wall = time.perf_counter() - t0
    print(json.dumps({
        "wall_sec": round(wall, 3),
        "sequences": res["sequences"],
        "tokens": res["tokens"],
        "sequences_per_sec": round(res["sequences"] / wall, 1) if wall else 0,
        "tokens_per_sec": round(res["tokens"] / wall, 1) if wall else 0,
        "committed_epochs": res["committed_epochs"],
        "output_rows": res["output_rows"],
        "root": res["root"],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
