"""Long-stream soak: hundreds of micro-batch epochs through windows + join +
incremental encoders; verifies correctness at the end and that per-epoch
latency stays flat (no state/applied-set growth effects)."""
import sys, time, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np, pyarrow as pa

def main(n_epochs=300, rows=200, sync_every=1, pipelined=False):
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from diffdataflowmlpipelines_ray.streaming.engine import (
        KeyedAggregation, StreamJoin, StreamSession, WindowSpec)
    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="soak-", dir="/tmp")
    sess = StreamSession(root, num_shards=4, checkpoint_every=50,
                         sync_every=sync_every, pipelined=pipelined)
    sess.add(KeyedAggregation(name="win", input="e", key_cols=["u"], value_col="v",
                              ts_col="ts", aggs=("count", "sum"),
                              window=WindowSpec.tumbling(100.0)))
    sess.add(StreamJoin(name="j", left_input="e", right_input="r",
                        left_key=["u"], right_key=["u"],
                        left_cols=["v"], right_cols=["rv"], retention=500.0,
                        left_ts="ts", right_ts="rts"))
    t_first = t_last = None
    lat = []
    total_rows = 0
    for e in range(n_epochs):
        ts0 = e * 10.0
        tbl = pa.table({"u": rng.integers(0, 20, rows),
                        "ts": ts0 + np.sort(rng.uniform(0, 10, rows)),
                        "v": np.ones(rows)})
        rt = pa.table({"u": rng.integers(0, 20, 5),
                       "rts": ts0 + rng.uniform(0, 10, 5),
                       "rv": np.arange(5.0)})
        t0 = time.perf_counter()
        sess.process_epoch(e, {"e": tbl, "r": rt}, watermark=ts0)
        dt = time.perf_counter() - t0
        total_rows += rows
        lat.append(dt)
        if e == 10: t_first = dt
        if e == n_epochs - 1: t_last = dt
    sess.close()
    out = sess.sinks["win"].read_committed_table().to_pandas()
    assert out["count"].sum() == total_rows, (out["count"].sum(), total_rows)
    print(f"epochs={n_epochs} rows={total_rows} window_count_sum={int(out['count'].sum())}")
    lat.sort()
    print(f"epoch latency: early={t_first*1e3:.1f}ms late={t_last*1e3:.1f}ms "
          f"median={lat[len(lat)//2]*1e3:.1f}ms p99={lat[int(len(lat)*0.99)]*1e3:.1f}ms "
          f"(flat ⇒ no state growth in the hot path)")
    shard_stats = sess.stats() if sess.store.shards else None
    ray.shutdown()
    print("SOAK OK")

if __name__ == "__main__":
    kw = {}
    for a in sys.argv[1:]:
        k, v = a.split("=")
        kw[k] = int(v) if v.isdigit() else bool(int(v))
    main(**kw)
