"""Benchmark harness.

Headline: files/sec through the full near-duplicate detection + clustering
pipeline over a deterministic synthetic source-code corpus (FIXTURES.md F1
shape — the BASELINE.json input_hint), generated once and cached under /tmp.
Plus per-query timings over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "files": n, "files_per_sec": r}

--scaling: runs the headline job in two fresh processes (num_cpus=8 and 32)
on the same input and reports both throughputs + scaling efficiency — the
sandbox proxy for the north rule's N -> 4N cluster-size criterion
(BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_BASE = int(os.environ.get("GRAFT_BENCH_NBASE", "20000"))

BENCH_QUERIES = [
    "exact_dedup_groups",
    "minhash_dedup_clusters",
    "ann_cosine_topk",
    "token_counts",
    "join_lineitem_orders",
    "returnflag_totals",
    "keep_latest_order_per_customer",
    "hourly_event_counts",
]


def corpus_path() -> str:
    import pyarrow.parquet as pq

    path = f"/tmp/graft_bench_corpus_nb{N_BASE}_sharded"
    if not os.path.exists(path):
        from nhse_probabilistic_linkage_ray.sources.corpus import generate_corpus

        t = generate_corpus(n_base=N_BASE)
        # SHARDED layout (round 5): ray.data.read_parquet parallelizes by
        # FILE — a single corpus file was read by ONE task (serial 3.2 s at
        # 35k rows, ~9 s at 1.05M) that gated every downstream map; 64+
        # shards read at full width (measured 3.6 -> 0.6 s for
        # read+normalize at 35k rows / 32 CPUs). Also the layout the
        # resumable-output contract prescribes — never one giant file.
        # Small row groups keep intra-file splits for narrow re-reads.
        n = len(t)
        shards = max(64, -(-n // 65536))
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        for i in range(shards):
            lo_r, hi_r = i * n // shards, (i + 1) * n // shards
            if hi_r > lo_r:
                pq.write_table(t.slice(lo_r, hi_r - lo_r),
                               f"{tmp}/part-{i:05d}.parquet", row_group_size=1024)
        os.rename(tmp, path)
    return path


def host_health() -> dict:
    """Two-number snapshot of what this shared host grants RIGHT NOW, embedded
    in every bench JSON so cross-round comparisons can be normalized:
    - cpu_iters_per_sec: single-process numpy uint64 multiply-add (the MinHash
      inner loop), ALL IN-PLACE — pure compute availability. (The round-2/3
      version allocated an 8 MB temp per iteration, so in a provisioning
      collapse it read ~1 it/s even when the CPU itself was fully granted —
      the two signals were conflated; in-place ops separate them.)
    - first_touch_mb_per_sec: touch fresh pages for a BOUNDED time window —
      page provisioning speed, which on this memory-overcommitted VM swings
      1000x on second timescales and dominates allocation-heavy stages."""
    import time as _t

    import numpy as _np

    x = _np.arange(1_000_000, dtype=_np.uint64)
    a = _np.uint64(0x9E3779B97F4A7C15)
    t0 = _t.perf_counter()
    iters = 0
    while _t.perf_counter() - t0 < 1.0:
        _np.multiply(x, a, out=x)
        _np.bitwise_xor(x, x >> _np.uint64(31), out=x)
        iters += 1
    cpu = iters / (_t.perf_counter() - t0)
    return {"cpu_iters_per_sec": round(cpu, 1),
            "first_touch_mb_per_sec": first_touch_probe(),
            "resident_mb_per_sec": resident_bw_probe()}


_RESIDENT_BUF = None


def resident_bw_probe() -> float:
    """MB/s of READING already-resident pages — the bandwidth a warmed-up
    timed run actually lives on. On this host first-touch provisioning and
    resident bandwidth are metered SEPARATELY (measured 2026-08-18: resident
    7.5-10 GB/s while first-touch read 22 MB/s), so first-touch is the wrong
    validity instrument for post-warm-up timed windows — it rejected six
    straight healthy windows in round 3. The 128 MB buffer faults once per
    process (paid at provisioning speed) and is reused; each call is one
    timed sum pass (~15-130 ms)."""
    global _RESIDENT_BUF
    import time as _t

    import numpy as _np

    if _RESIDENT_BUF is None:
        _RESIDENT_BUF = _np.ones((128 << 20) >> 3, dtype=_np.float64)
    t0 = _t.perf_counter()
    _RESIDENT_BUF.sum()
    dt = _t.perf_counter() - t0
    return round(128 / dt, 1) if dt > 0 else float("inf")


def first_touch_probe(max_mb: int = 256, max_sec: float = 2.0) -> float:
    """MB/s of faulting FRESH pages, bounded by time so a collapsed window
    (~5 MB/s) costs ~2 s instead of 50 s. Touches page-by-page and reports
    pages actually touched / elapsed."""
    import time as _t

    import numpy as _np

    step = 1 << 20  # 1 MB chunks: bound the overshoot past the deadline
    buf = _np.empty(max_mb << 20, dtype=_np.uint8)
    t0 = _t.perf_counter()
    done = 0
    for off in range(0, max_mb << 20, step):
        buf[off:off + step:4096] = 1
        done += step
        if _t.perf_counter() - t0 >= max_sec:
            break
    ft = (done / (1 << 20)) / (_t.perf_counter() - t0)
    del buf
    return round(ft, 1)


def read_steal(ncpu: int | None = None) -> tuple[int, float]:
    """(steal ticks summed over cpu0..cpu{ncpu-1}, timestamp). Guest-kernel
    accounting of cycles the hypervisor withheld while a vCPU was runnable —
    the precise, continuous form of what the 3 s probe brackets guessed at.
    NOTE: does NOT capture page-provisioning stalls (those are charged to
    user/system time while the vCPU blocks in the host fault path), so it is
    the CPU-steal signal only; first_touch_probe is the provisioning signal."""
    import time as _t

    total = 0
    with open("/proc/stat") as f:
        for line in f:
            if not line.startswith("cpu"):
                break
            parts = line.split()
            if parts[0] == "cpu":
                if ncpu is None:
                    return int(parts[8]), _t.time()
                continue
            idx = int(parts[0][3:])
            if idx < ncpu:
                total += int(parts[8])
    return total, _t.time()


# Calm-window thresholds (BASELINE.md): cpu_iters_per_sec is the decisive
# signal on this host; first_touch degrades independently and a good bench
# has been measured at ft=77 MB/s, so its gate is the loose "not collapsed".
CALM_CPU = float(os.environ.get("GRAFT_CALM_CPU", "250"))
CALM_FT = float(os.environ.get("GRAFT_CALM_FT", "50"))
# resident-bandwidth alternative: a provisioning-throttled window with full
# resident bandwidth is perfectly usable for a warmed-up timed run
CALM_RB = float(os.environ.get("GRAFT_CALM_RB", "3000"))


def is_calm(h: dict) -> bool:
    return h["cpu_iters_per_sec"] >= CALM_CPU and (
        h["first_touch_mb_per_sec"] >= CALM_FT
        or h.get("resident_mb_per_sec", 0.0) >= CALM_RB)


def wait_for_calm(max_wait_sec: float, poll_sec: float = 60.0) -> dict:
    """Poll host_health until a calm window or the deadline; return the last
    (best-effort) probe. Keeps BENCH JSONs from silently recording hypervisor
    steal (round-2's 101.8 s artifact): the caller stamps ``degraded`` from
    the returned probe either way."""
    deadline = time.time() + max_wait_sec
    h = host_health()
    while not is_calm(h) and time.time() < deadline:
        print(json.dumps({"waiting_for_calm_window": h}), file=sys.stderr, flush=True)
        time.sleep(poll_sec)
        h = host_health()
    return h


def _driver_mallopt() -> None:
    """MALLOC_*_THRESHOLD_ env vars only affect processes that START with
    them (Ray workers); glibc read the driver's at its own startup. Apply the
    same policy to the already-running driver via mallopt(3) so driver-side
    allocations (take_all, union-find) also reuse freed blocks instead of
    munmap/mmap churn (ADVICE r2)."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 512 << 20)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 512 << 20)  # M_TRIM_THRESHOLD
    except Exception:
        pass


def _prefault_object_store(ray, store_bytes: int) -> None:
    """Fault the plasma store's tmpfs pages ONCE, before anything is timed.

    The store is a /dev/shm mapping whose pages are provisioned by the host
    on first write; on this memory-overcommitted VM that path collapses to
    ~5 MB/s for minutes at a time (BASELINE.md "weather"). tmpfs pages stay
    resident once touched (no swap here), so ray.put-ing throwaway chunks up
    to ~80% of capacity moves the entire provisioning cost out of the timed
    window — afterwards object creation reuses already-backed pages whatever
    the weather. Also explains round-3's inverse scaling artifacts: an 8-CPU
    run faults more pages concurrently than a 2-CPU run, so provisioning
    collapse punishes the WIDE run harder — pre-faulting removes that bias.

    Time-bounded (GRAFT_PREFAULT_MAX_SEC, default 180 s): in a collapsed
    window (~7 MB/s) an unbounded 6.4 GB pre-fault would cost ~15 min per
    process; a partial pre-fault is fine because the full-corpus warm-up run
    that follows touches the remaining working-set pages anyway."""
    import numpy as np

    chunk = 64 << 20
    target = int(store_bytes * 0.80)
    deadline = time.time() + float(os.environ.get("GRAFT_PREFAULT_MAX_SEC", "180"))
    refs = []
    try:
        for _ in range(target // chunk):
            refs.append(ray.put(np.zeros(chunk, dtype=np.uint8)))
            if time.time() >= deadline:
                break
    except Exception:
        pass  # store smaller than expected: whatever faulted is still warm
    del refs


def run_bench() -> dict:
    import ray

    # glibc: reuse freed large blocks instead of munmap/mmap churn — fresh
    # page provisioning on this memory-overcommitted host can run 25-300x
    # slower than resident reuse (see host_health.first_touch_mb_per_sec).
    # Must be set before ray.init so spawned workers inherit it.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(512 << 20))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(512 << 20))
    _driver_mallopt()

    # Gate on host weather: poll (bounded) for a calm window so a recorded
    # number is comparable across rounds; if none arrives, run anyway and
    # stamp degraded=true so the reader knows the number is a steal artifact.
    health_pre = wait_for_calm(float(os.environ.get("GRAFT_CALM_WAIT_SEC", "900")))
    # Size the object store to the corpus: the Ray default (30% of 128 GB)
    # maps ~39 GB of tmpfs whose pages fault against the host's provisioning
    # weather mid-run, while a store SMALLER than the live working set forces
    # disk spilling — a round-3 scaling run at nbase=300000 (525k files) with
    # the old fixed 8 GB cap spilled 7.3 GiB per run to /dev/vda, and that
    # disk-bound component doesn't scale with CPUs (healthy-window raw
    # efficiency collapsed to ~0.44 from spill alone). Default: the measured
    # headline floor (8 GB covers nbase <= ~90k) grown linearly with the
    # corpus, so the pipeline streams through plasma without touching disk;
    # the untimed full-corpus warm-up run faults the pages so the timed
    # window still reuses resident memory. GRAFT_OBJ_STORE_GB overrides.
    # cap raised 48 -> 64 in round 4: the 48 GB ceiling made nbase=600000
    # (1.05M files, ~56 GB working set) spill to disk — the same non-scaling
    # I/O term as round 3's 8 GB cap, and the r3i hunt's floor jump 18->77 s
    auto_gb = max(8.0, min(64.0, N_BASE / 300_000 * 28.0))
    obj_gb = float(os.environ.get("GRAFT_OBJ_STORE_GB", str(auto_gb)))
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             object_store_memory=int(obj_gb * (1 << 30)))
    import ray.data

    # Scaling children skip the pre-fault: their FULL-corpus warm-up run
    # touches the same plasma working set anyway (freed objects return to the
    # pool without unmapping, so pages stay resident), while pre-faulting 80%
    # of the store burns ~5 GB of page-provisioning budget right before the
    # timed window — on this host a faulting burst is followed by minutes of
    # throttled (~10 MB/s) provisioning, which is exactly the round-3
    # every-timed-window-collapsed pattern. Explicit GRAFT_PREFAULT_MAX_SEC
    # still forces it.
    if not (os.environ.get("GRAFT_TIMED_MARKER")
            and os.environ.get("GRAFT_BENCH_WARM_FULL")
            and "GRAFT_PREFAULT_MAX_SEC" not in os.environ):
        _prefault_object_store(ray, int(obj_gb * (1 << 30)))

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # default min_parallelism is 200: every sort-shuffle schedules 200 reduce
    # tasks regardless of cluster width — a CPU-independent constant that
    # dominates small clusters. Size it to the cluster (2x CPUs measured
    # slightly ahead of 4x at this data scale).
    ctx.min_parallelism = max(8, 2 * NUM_CPUS)

    from nhse_probabilistic_linkage_ray.config import PipelineConfig
    from nhse_probabilistic_linkage_ray.pipelines.dedupe import dedupe_dataset
    from nhse_probabilistic_linkage_ray.pipelines.queries import queries as query_registry

    path = corpus_path()
    # warm the OS page cache so we measure compute + shuffle, not first read
    shard_files = ([os.path.join(path, p) for p in sorted(os.listdir(path))]
                   if os.path.isdir(path) else [path])
    for sp in shard_files:
        with open(sp, "rb") as f:
            while f.read(1 << 24):
                pass

    files_ds = ray.data.read_parquet(path)
    n_files = files_ds.count()

    # warm the Ray worker pool + import path untimed (first execution in a
    # fresh session spawns ~num_cpus worker processes; that cold-start cost
    # is per-cluster, not per-byte — the bench measures steady-state).
    # GRAFT_BENCH_WARM_FULL=1 (scaling children) warms with the FULL corpus:
    # the first full run faults every worker's peak heap (glibc keeps freed
    # blocks resident via the raised trim threshold), so the timed runs touch
    # no fresh pages and are immune to provisioning weather.
    # GRAFT_AUTO_BANDING (default 1): let the pipeline pick its banding tier
    # from the measured corpus size, matching run_dedupe's default-on policy.
    # Below 1M representatives the tier is the default (128, 32), so headline
    # numbers at nbase<=300000 are bit-identical to the pinned-tier protocol;
    # at 1.05M files the r=5 tier engages (VERDICT r4 #1 done-bar) and the
    # decision is visible in the profile marks. Set 0 to pin the r=4 tier
    # for cross-size A/B runs.
    auto_banding = os.environ.get("GRAFT_AUTO_BANDING", "1") != "0"
    if os.environ.get("GRAFT_BENCH_WARM_FULL"):
        dedupe_dataset(files_ds, PipelineConfig(),
                       auto_banding=auto_banding)["clusters"].count()
    else:
        warm = ray.data.read_parquet(path).limit(4096)
        dedupe_dataset(warm, PipelineConfig())["clusters"].count()

    # GRAFT_SETTLE_SEC (default 0 = off): drop warm-run references, force a
    # GC and idle briefly before the timed window. Hypothesis test for the
    # measured second-full-run-in-session score inflation (~+13 s at 1.05M
    # files, BASELINE.md r4b): the warm run's freed plasma objects are
    # reclaimed lazily, and a timed run starting near store capacity pays
    # eviction churn a first-run-of-session production job never sees.
    settle = float(os.environ.get("GRAFT_SETTLE_SEC", "0"))
    if settle:
        import gc

        gc.collect()
        time.sleep(settle)

    # best of N timed runs (default 2): identical back-to-back executions
    # vary up to 2x on this shared host (documented in BASELINE.md); the
    # minimum is the least-stolen measurement of the same fixed workload.
    # Scaling children set GRAFT_BENCH_TIMED_RUNS=1 — their long pinned runs
    # self-average and doubling them doubles an already-long protocol.
    # Per-run CPU-steal fraction (guest-kernel accounting over the CPUs this
    # process is pinned to — NUM_CPUS when launched under taskset) is stamped
    # so a reader can reject stolen runs without guessing from probes.
    headline = float("inf")
    n_clusters = 0
    steal_frac = None
    pin_n = NUM_CPUS if os.environ.get("GRAFT_PINNED") else None
    # scaling children: mark the moment the TIMED window opens so the parent's
    # watchdog only judges in-run weather collapse after warm-up/pre-fault.
    # Before opening it, gate HERE (bounded) on provisioning health — the
    # round-3 pattern was a calm pre-pair probe followed by a collapsed timed
    # window ~10 minutes later (setup takes that long at 2 pinned CPUs); the
    # pre-pair gate fires at the wrong moment, this one fires at the right
    # one. On deadline expiry run anyway — the parent watchdog and the
    # ft_in_run validity gate still protect the measurement.
    marker = os.environ.get("GRAFT_TIMED_MARKER")
    if marker:
        gate_sec = float(os.environ.get("GRAFT_TIMED_GATE_SEC", "420"))
        gate_ft = float(os.environ.get("GRAFT_TIMED_GATE_FT", "40"))
        gate_rb = float(os.environ.get("GRAFT_TIMED_GATE_RB", "3000"))
        gate_deadline = time.time() + gate_sec
        while time.time() < gate_deadline:
            # resident bandwidth is what the warmed-up timed run lives on;
            # healthy first-touch also passes (implies both resources)
            if (resident_bw_probe() >= gate_rb
                    or first_touch_probe(max_mb=64, max_sec=1.0) >= gate_ft):
                break
            time.sleep(15)
        open(marker, "w").close()
    for _ in range(int(os.environ.get("GRAFT_BENCH_TIMED_RUNS", "2"))):
        s0, st0 = read_steal(pin_n)
        t0 = time.time()
        out = dedupe_dataset(files_ds, PipelineConfig(), auto_banding=auto_banding)
        n_clusters = out["clusters"].count()
        dt = time.time() - t0
        s1, st1 = read_steal(pin_n)
        if dt < headline:
            headline = dt
            denom = (st1 - st0) * 100.0 * (pin_n or 32)
            steal_frac = round((s1 - s0) / denom, 4) if denom else None

    qtimes = {}
    if not os.environ.get("GRAFT_SKIP_QUERIES"):
        qs = query_registry()
        for name in BENCH_QUERIES:
            t0 = time.time()
            res = qs[name](SF_DIR)
            if hasattr(res, "count"):
                res.count()
            qtimes[name] = round(time.time() - t0, 3)

    health_post = host_health()
    result = {
        "metric": "dedup pipeline seconds (synthetic code corpus) + per-query seconds",
        "host_health": health_post,
        "host_health_pre": health_pre,
        "degraded": not (is_calm(health_pre) or is_calm(health_post)),
        "value": round(headline, 3),
        "steal_frac": steal_frac,
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "files": n_files,
        "rows_out": n_clusters,
        "files_per_sec": round(n_files / headline, 1),
    }
    ray.shutdown()
    return result


def _probe_worker(stop_ns: float, q) -> None:
    import time as _t

    import numpy as _np

    x = _np.arange(1_000_000, dtype=_np.uint64)
    a = _np.uint64(0x9E3779B97F4A7C15)
    iters = 0
    # in-place: measure granted CPU, not page provisioning (see host_health)
    while _t.perf_counter_ns() < stop_ns:
        _np.multiply(x, a, out=x)
        _np.bitwise_xor(x, x >> _np.uint64(31), out=x)
        iters += 1
    q.put(iters)


def _bw_probe_worker(stop_ns, q):
    import time as _t

    import numpy as _np

    # 256 MB resident buffer: fault once (untimed), then stream-sum until
    # stop — measures the memory bandwidth the host grants THIS pinned set,
    # the resource the pipeline's scan/gather/shuffle stages live on.
    x = _np.ones((256 << 20) >> 3, dtype=_np.float64)
    float(x.sum())  # fault + warm
    passes = 0
    t0 = _t.perf_counter_ns()
    while True:
        float(x.sum())
        passes += 1
        # always >= 1 timed pass: on a provisioning-collapsed host the fault
        # above can outlive the window, and 0 passes would read as 0 MB/s
        if _t.perf_counter_ns() >= stop_ns:
            break
    dt = (_t.perf_counter_ns() - t0) / 1e9
    q.put(passes * 256.0 / max(dt, 1e-9))


def run_bw_probe(n_procs: int, seconds: float = 3.0) -> dict:
    """Aggregate memory-bandwidth probe: n pinned processes each stream-
    summing a resident 256 MB buffer. The compute probe (run_probe) measures
    the CPU grant; THIS measures the memory-bus grant — on a single shared
    host both pinned sets (2 and 8 CPUs) draw from ONE memory controller, so
    a bandwidth-bound stage cannot scale past bw(hi)/bw(lo) no matter how
    well it parallelizes, while on a real N -> 4N node cluster the bus count
    scales with nodes. bw(hi)/bw(lo) is therefore the hardware ceiling for
    the pipeline's bandwidth-bound stages (ingest scan, score ragged
    gathers), as iters(hi)/iters(lo) is for its compute-bound ones
    (MinHash, band hashing)."""
    import multiprocessing as mp
    import time as _t

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    stop = _t.perf_counter_ns() + int(seconds * 1e9)
    procs = [ctx.Process(target=_bw_probe_worker, args=(stop, q))
             for _ in range(n_procs)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return {"n_procs": n_procs, "mb_per_sec": round(total, 1)}


def run_probe(n_procs: int, seconds: float = 3.0) -> dict:
    """Raw-hardware probe: n processes of pure numpy uint64 multiply-add (the
    MinHash inner loop) for ``seconds``; prints aggregate iterations/sec.
    Run under the same taskset as a bench level, this measures how much
    parallel compute the host ACTUALLY grants that level at this moment —
    the denominator for noise-normalized scaling efficiency on a shared,
    oversubscribed VM."""
    import multiprocessing as mp
    import time as _t

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    stop = _t.perf_counter_ns() + int(seconds * 1e9)
    procs = [ctx.Process(target=_probe_worker, args=(stop, q)) for _ in range(n_procs)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return {"n_procs": n_procs, "iters_per_sec": round(total / seconds, 1)}


def run_scaling() -> dict:
    """N vs 4N CPUs in fresh processes on the same input, REPEATED, median
    reported.

    Default N=2 (2 -> 8): this sandbox advertises 32 vCPUs but a pure-numpy
    multiprocessing probe measures only ~2.4x aggregate throughput going from
    8 to 32 processes (oversubscribed vCPUs — ~16 effective hardware
    threads), so 8 -> 32 measures the hypervisor, not the pipeline. 2 -> 8
    runs on honestly-available cores. Override with GRAFT_SCALE_LO/HI.

    The host is a shared VM with +/-40% wall-time variance between identical
    runs, so a single pair of runs is meaningless: GRAFT_SCALE_REPEATS
    (default 3) interleaved lo/hi pairs are run and the per-pair efficiencies
    plus their median are reported. The scaling corpus defaults to the larger
    GRAFT_SCALE_NBASE=60000 (105k files) so per-run fixed costs (worker
    spawn, shuffle scheduling) don't dominate the measurement."""

    # --strict / GRAFT_SCALE_STRICT=1: the r3h protocol of record as one
    # switch (BASELINE.md) — pooled singles, in-run first-touch median >= 100
    # MB/s REQUIRED for validity (the rb-only channel disabled), hunt until 3
    # valid runs per side. Individual env vars still override.
    if "--strict" in sys.argv or os.environ.get("GRAFT_SCALE_STRICT"):
        os.environ.setdefault("GRAFT_SCALE_POOL", "1")
        os.environ.setdefault("GRAFT_CALM_FT_INRUN", "100")
        os.environ.setdefault("GRAFT_CALM_RB_INRUN", "1000000000")
        os.environ.setdefault("GRAFT_SCALE_TARGET_VALID", "3")
        # small glibc trim/mmap thresholds for the children: persistent
        # workers otherwise accumulate untrimmed heap run over run and the
        # second (timed) full pass pays ~+15 s in the score stage (measured
        # 19.3/36.9/170.7 s over three runs at 512 MB thresholds vs
        # 20.4/37.7/23.6 at 64 MB — BASELINE.md). Trimming re-faults pages
        # at provisioning speed, which is exactly what the strict gate's
        # calm-window requirement makes safe; non-strict runs keep the big
        # thresholds to stay robust in bad weather.
        os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(64 << 20))
        os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(64 << 20))

    nbase = os.environ.get("GRAFT_SCALE_NBASE", "60000")

    import shutil as _sh

    def pin(cmd: list, ncpu: int) -> list:
        # pin the ENTIRE Ray node (driver + raylet + all workers) to ncpu
        # physical CPUs: ray.init(num_cpus=N) only caps task scheduling slots
        # — helper threads and the Ray control plane would otherwise spill
        # onto the host's remaining cores and flatter the small run
        if _sh.which("taskset"):
            return ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        return cmd

    def run(ncpu: int) -> dict:
        # children never self-wait: the calm gate runs HERE, once per pair,
        # so both levels of a pair execute back-to-back in the same window.
        # GRAFT_BENCH_WARM_FULL: the child warms with a full-size untimed run
        # (resident heaps + pre-faulted plasma) so its timed window touches no
        # fresh pages; GRAFT_PINNED tells it to read steal over cpu0..N-1.
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_NBASE=nbase,
                   GRAFT_SKIP_QUERIES="1", GRAFT_BENCH_TIMED_RUNS="1",
                   GRAFT_CALM_WAIT_SEC="0", GRAFT_BENCH_WARM_FULL="1",
                   GRAFT_PINNED="1", GRAFT_PROFILE="1")
        cmd = pin([sys.executable, os.path.abspath(__file__)], ncpu)
        # concurrent weather trace on CPUs OUTSIDE any pinned bench set: the
        # round-2/3 failure mode was a pre-pair probe passing and the window
        # collapsing mid-run, invisibly. The trace records provisioning speed
        # DURING the run; the child reports its own timed-window steal_frac.
        trace_path = f"/tmp/graft_weather_{os.getpid()}_{ncpu}.jsonl"
        sampler_cmd = [sys.executable, os.path.abspath(__file__),
                       "--weather-sampler", trace_path]
        if _sh.which("taskset"):
            sampler_cmd = ["taskset", "-c", "28-31"] + sampler_cmd
        # collection-mode watchdog (GRAFT_SCALE_TARGET_VALID): a run whose
        # timed window sits in a provisioning collapse can only produce an
        # invalid pair, yet riding it out costs 10-25 min of hunt budget (the
        # round-3 doomed pair: hi run 408 s vs 275 s at lo — inverse scaling
        # under 10 MB/s first-touch). Abort the child when the concurrent
        # weather trace shows sustained collapse (8 consecutive samples, i.e.
        # ~40 s, below GRAFT_CALM_FT_INRUN) after a grace period from the
        # moment the child opens its timed window (GRAFT_TIMED_MARKER), or on
        # a hard timeout. Legacy fixed-repeat mode is untouched.
        marker = trace_path + ".start"
        out_path, err_path = trace_path + ".out", trace_path + ".err"
        try:
            os.unlink(marker)
        except OSError:
            pass
        env["GRAFT_TIMED_MARKER"] = marker
        sampler = subprocess.Popen(sampler_cmd, stdout=subprocess.DEVNULL,
                                   stderr=subprocess.DEVNULL)
        aborted = None
        try:
            with open(out_path, "w") as of, open(err_path, "w") as ef:
                proc = subprocess.Popen(
                    cmd, env=env, stdout=of, stderr=ef,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                    start_new_session=True)
            t_child = time.time()
            grace = float(os.environ.get("GRAFT_SCALE_ABORT_GRACE", "90"))
            run_timeout = float(os.environ.get("GRAFT_SCALE_RUN_TIMEOUT", "2400"))
            while proc.poll() is None:
                time.sleep(5)
                if not target_valid:
                    continue  # legacy mode: never abort
                if time.time() - t_child > run_timeout:
                    aborted = "timeout"
                elif (os.path.exists(marker)
                      and time.time() - os.path.getmtime(marker) > grace):
                    # Watchdog abort criterion is DECOUPLED from the validity
                    # gate (round-3 lesson: overloading GRAFT_CALM_RB_INRUN for
                    # both meant an ft-only validity config turned the watchdog
                    # into an unconditional killer). A sample marks collapse
                    # only when BOTH channels are down: first-touch
                    # HARD-collapsed (< GRAFT_WATCHDOG_FT, the ~5-15 MB/s
                    # regime where runs inverse-scale) AND resident bandwidth
                    # below GRAFT_WATCHDOG_RB. A warmed-up child lives on
                    # resident reads, so healthy rb with throttled ft is a
                    # run the validity gate will PASS (rb is decisive there)
                    # — the watchdog must not kill it (it did: a 300k single
                    # with rb med 8.4 GB/s died as "weather_collapse" on ft
                    # alone). Traces without rb instrumentation fall back to
                    # ft-only, matching the legacy behavior.
                    try:
                        tail = [json.loads(ln) for ln in
                                open(trace_path).read().splitlines()[-8:]]
                    except Exception:
                        tail = []
                    wd_ft = float(os.environ.get("GRAFT_WATCHDOG_FT", "10"))
                    wd_rb = float(os.environ.get("GRAFT_WATCHDOG_RB", "1500"))
                    if len(tail) >= 8 and all(
                            s["ft"] < wd_ft and s.get("rb", 0.0) < wd_rb
                            for s in tail):
                        aborted = "weather_collapse"
                if aborted:
                    import signal as _sig
                    try:
                        os.killpg(proc.pid, _sig.SIGTERM)
                    except ProcessLookupError:
                        pass
                    try:
                        proc.wait(timeout=15)
                    except subprocess.TimeoutExpired:
                        try:
                            os.killpg(proc.pid, _sig.SIGKILL)
                        except ProcessLookupError:
                            pass
                        proc.wait()
                    break
        finally:
            sampler.terminate()
            sampler.wait()
        if aborted:
            res: dict = {"aborted": aborted, "value": None, "steal_frac": None}
        elif proc.returncode != 0:
            raise subprocess.CalledProcessError(
                proc.returncode, cmd, open(out_path).read(), open(err_path).read())
        else:
            out = open(out_path).read()
            res = json.loads(out.strip().splitlines()[-1])
        # stage decomposition + spill evidence from the child's stderr: the
        # r3i 1.05M hunt measured a floor jump (18 -> 77 s) that the run
        # records alone could not attribute — keep the timed-run stage marks
        # (GRAFT_PROFILE, last occurrence per stage = the timed pass) and any
        # Ray object-spill messages so every scaling record is self-explaining.
        try:
            import re as _re
            stages: dict = {}
            spilled_mb = 0.0
            for ln in open(err_path, errors="replace"):
                m = _re.match(r"\[dedupe\] (.+): ([0-9.]+)s", ln)
                if m:
                    stages[m.group(1)] = float(m.group(2))
                m = _re.search(r"Spilled ([0-9]+) MiB", ln)
                if m:
                    spilled_mb = max(spilled_mb, float(m.group(1)))
            res["stages"] = stages or None
            res["spilled_mb"] = spilled_mb
        except Exception:
            pass
        try:
            samples = [json.loads(ln) for ln in open(trace_path)]
            fts = sorted(s["ft"] for s in samples)
            res["ft_in_run"] = {"min": fts[0], "med": fts[len(fts) // 2],
                                "n": len(fts)}
            rbs = sorted(s["rb"] for s in samples if "rb" in s)
            res["rb_in_run"] = ({"min": rbs[0], "med": rbs[len(rbs) // 2],
                                 "n": len(rbs)} if rbs else None)
            os.unlink(trace_path)
        except Exception:
            res["ft_in_run"] = None
            res["rb_in_run"] = None
        for p in (out_path, err_path, marker):
            try:
                os.unlink(p)
            except OSError:
                pass
        return res

    def probe(ncpu: int) -> float:
        cmd = pin([sys.executable, os.path.abspath(__file__), "--probe", str(ncpu)], ncpu)
        out = subprocess.run(cmd, env=dict(os.environ), capture_output=True,
                             text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])["iters_per_sec"]

    def bw_probe(ncpu: int) -> float:
        cmd = pin([sys.executable, os.path.abspath(__file__),
                   "--bw-probe", str(ncpu)], ncpu)
        out = subprocess.run(cmd, env=dict(os.environ), capture_output=True,
                             text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])["mb_per_sec"]

    lo = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", str(lo * 4)))
    repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "3"))
    pair_calm_wait = float(os.environ.get("GRAFT_SCALE_CALM_WAIT_SEC", "900"))
    # collection mode: instead of a fixed repeat count, keep running pairs
    # until TARGET_VALID pairs are valid (steal-calm AND in-run provisioning
    # healthy) or the wall budget expires. The round-2/3 lesson: degraded
    # pairs are worthless, so spend wall time hunting calm windows, not
    # repeating into known-bad ones — in this mode a pair whose pre-gate
    # never turns calm is SKIPPED (sleep + re-gate), never burned.
    target_valid = int(os.environ.get("GRAFT_SCALE_TARGET_VALID", "0"))
    max_wall = float(os.environ.get("GRAFT_SCALE_MAX_WALL_SEC", "7200"))
    ft_inrun_min = float(os.environ.get("GRAFT_CALM_FT_INRUN", "30"))
    rb_inrun_min = float(os.environ.get("GRAFT_CALM_RB_INRUN", "1500"))
    log_path = os.environ.get("GRAFT_SCALE_LOG", "/tmp/graft_scaling_pairs.jsonl")
    t_start = time.time()
    # stamp the active gate thresholds into every record: runs collected
    # under different validity configs must never be pooled silently
    gate_cfg = {"ft_inrun_min": ft_inrun_min, "rb_inrun_min": rb_inrun_min,
                "calm_ft": CALM_FT, "calm_rb": CALM_RB, "calm_cpu": CALM_CPU,
                "nbase": int(nbase),
                "obj_store_gb": float(os.environ.get(
                    "GRAFT_OBJ_STORE_GB",
                    str(max(8.0, min(64.0, int(nbase) / 300_000 * 28.0)))))}

    def ft_ok(r: dict) -> bool:
        # in-run weather validity: resident bandwidth (rb) is decisive —
        # a warmed-up timed run lives on resident reads, and this host
        # meters resident vs first-touch bandwidth separately. ft remains
        # the fallback for traces from pre-instrument children, and a
        # healthy ft also passes (it implies provisioning AND bandwidth).
        rb = r.get("rb_in_run")
        if rb:
            ft = r.get("ft_in_run")
            return rb["med"] >= rb_inrun_min or (
                bool(ft) and ft["med"] >= ft_inrun_min)
        fi = r.get("ft_in_run")
        return bool(fi) and fi["med"] >= ft_inrun_min

    # Pool mode (GRAFT_SCALE_POOL=1): hunt valid lo and hi runs INDEPENDENTLY
    # instead of strict back-to-back pairs. Rationale (round 3): while a
    # bench child is alive and holding its working set this host throttles
    # provisioning (in-run first-touch 10-20 MB/s across six straight
    # attempts, vs 87-1478 MB/s whenever no child exists), so a valid pair
    # needs ~13-20 contiguous healthy minutes that never occur — but a valid
    # SINGLE needs only its own timed window healthy (hi: ~90 s). Both sides
    # carry identical validity gates (steal < 3%, in-run first-touch median
    # >= GRAFT_CALM_FT_INRUN), so the pooled medians compare like with like;
    # each record stamps its own health for the reader. Efficiency =
    # median(valid lo secs) / ((hi/lo) * median(valid hi secs)).
    if os.environ.get("GRAFT_SCALE_POOL"):
        singles: list = []

        def _n_valid(side: int) -> int:
            return sum(1 for s in singles if s["side"] == side and s["valid"])

        while time.time() - t_start <= max_wall:
            vlo_n, vhi_n = _n_valid(lo), _n_valid(hi)
            if target_valid and vlo_n >= target_valid and vhi_n >= target_valid:
                break
            pre = wait_for_calm(pair_calm_wait)
            if not is_calm(pre):
                continue
            # run the side with fewer valid singles; tie -> hi (shorter timed
            # window, more likely to land inside a calm burst)
            side = hi if vhi_n <= vlo_n else lo
            p = probe(side)
            pbw = bw_probe(side)
            r = run(side)
            ok = (not r.get("aborted") and r.get("steal_frac") is not None
                  and r["steal_frac"] < 0.03 and ft_ok(r))
            rec = {"side": side, "sec": r.get("value"),
                   "files_per_sec": r.get("files_per_sec"),
                   "probe_iters": p, "probe_bw_mb_s": pbw,
                   "steal_frac": r.get("steal_frac"),
                   "ft_in_run": r.get("ft_in_run"),
                   "rb_in_run": r.get("rb_in_run"), "aborted": r.get("aborted"),
                   "stages": r.get("stages"), "spilled_mb": r.get("spilled_mb"),
                   "host_health_pre": pre, "valid": ok, "gate_cfg": gate_cfg}
            singles.append(rec)
            print(json.dumps(rec), file=sys.stderr, flush=True)
            try:
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            except Exception:
                pass

        def _med(v):
            v = sorted(v)
            n = len(v)
            return (v[n // 2] if n % 2 else (v[n // 2 - 1] + v[n // 2]) / 2) if n else None

        lo_secs = [s["sec"] for s in singles if s["side"] == lo and s["valid"]]
        hi_secs = [s["sec"] for s in singles if s["side"] == hi and s["valid"]]
        lo_prob = [s["probe_iters"] for s in singles if s["side"] == lo and s["valid"]]
        hi_prob = [s["probe_iters"] for s in singles if s["side"] == hi and s["valid"]]
        lo_bw = [s["probe_bw_mb_s"] for s in singles
                 if s["side"] == lo and s["valid"] and s.get("probe_bw_mb_s")]
        hi_bw = [s["probe_bw_mb_s"] for s in singles
                 if s["side"] == hi and s["valid"] and s.get("probe_bw_mb_s")]
        m_lo, m_hi = _med(lo_secs), _med(hi_secs)
        eff = round(m_lo / ((hi / lo) * m_hi), 3) if m_lo and m_hi else None
        hw_speedup = (round(_med(hi_prob) / _med(lo_prob), 3)
                      if lo_prob and hi_prob else None)
        bw_speedup = (round(_med(hi_bw) / _med(lo_bw), 3)
                      if lo_bw and hi_bw else None)
        return {
            "metric": f"pooled scaling efficiency ({lo} -> {hi} CPUs, "
                      "independently valid singles)",
            "n_runs": len(singles),
            "n_valid_lo": len(lo_secs), "n_valid_hi": len(hi_secs),
            f"median_valid_sec_{lo}": m_lo, f"median_valid_sec_{hi}": m_hi,
            f"valid_secs_{lo}": lo_secs, f"valid_secs_{hi}": hi_secs,
            "pooled_efficiency": eff,
            "hw_probe_speedup_medians": hw_speedup,
            "pooled_efficiency_vs_hw": (round((m_lo / m_hi) / hw_speedup, 3)
                                        if eff and hw_speedup else None),
            "bw_probe_speedup_medians": bw_speedup,
            "pooled_efficiency_vs_bw": (round((m_lo / m_hi) / bw_speedup, 3)
                                        if eff and bw_speedup else None),
            "runs": singles,
        }

    pairs = []
    n_valid = 0
    while True:
        if target_valid:
            if n_valid >= target_valid or time.time() - t_start > max_wall:
                break
        elif len(pairs) >= repeats:
            break
        # wait (bounded) for a calm host window before EACH pair — round 2's
        # floor-amortized scaling run was unusable because it never landed in
        # one; stamp the pre-pair probe either way so BASELINE.md readers can
        # filter degraded pairs.
        pre_pair_health = wait_for_calm(pair_calm_wait)
        if target_valid and not is_calm(pre_pair_health):
            # known-bad window: a 15-minute pair here cannot be valid
            continue
        # hardware-availability probe IMMEDIATELY around each bench pair: on
        # this shared VM the hypervisor grants a varying number of effective
        # cores; the probe's lo->hi speedup is the ceiling ANY program can
        # reach at that moment, so efficiency_vs_hw = pipeline speedup /
        # probe speedup separates pipeline scaling from host steal.
        def _skip(reason: str, partial: dict) -> None:
            rec = dict(partial, skipped_pair=reason,
                       host_health_pre=pre_pair_health, valid=False)
            print(json.dumps(rec), file=sys.stderr, flush=True)
            try:
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            except Exception:
                pass

        p_lo = probe(lo)
        r_lo = run(lo)
        # mid-pair gate (collection mode): if the lo run already failed in-run
        # validity (aborted, stolen, or provisioning-collapsed), the pair
        # cannot be valid no matter what the hi run measures — skip the hi
        # run and return to hunting instead of burning its wall time.
        lo_valid = (not r_lo.get("aborted")
                    and r_lo.get("steal_frac") is not None
                    and r_lo["steal_frac"] < 0.03 and ft_ok(r_lo))
        if target_valid and not lo_valid:
            _skip("lo_run_invalid", {
                "aborted": r_lo.get("aborted"),
                f"sec_{lo}": r_lo.get("value"),
                f"steal_frac_{lo}": r_lo.get("steal_frac"),
                f"ft_in_run_{lo}": r_lo.get("ft_in_run")})
            continue
        p_hi = probe(hi)
        r_hi = run(hi)
        if target_valid and r_hi.get("aborted"):
            _skip("hi_run_aborted", {
                "aborted": r_hi.get("aborted"),
                f"sec_{lo}": r_lo.get("value"),
                f"steal_frac_{lo}": r_lo.get("steal_frac"),
                f"ft_in_run_{lo}": r_lo.get("ft_in_run"),
                f"ft_in_run_{hi}": r_hi.get("ft_in_run")})
            continue
        hw_speedup = p_hi / p_lo if p_lo else float("nan")
        speedup = r_lo["value"] / r_hi["value"]
        # calm_in_run: the decisive per-pair validity flag — BOTH timed
        # windows ran with <3% kernel-accounted CPU steal on their pinned
        # CPUs. (Provisioning weather is neutralized by the pre-faulted
        # store + full warm-up; ft_in_run is recorded as an annotation.)
        steals = [r_lo.get("steal_frac"), r_hi.get("steal_frac")]
        calm_in_run = all(s is not None and s < 0.03 for s in steals)
        # ft_in_run_ok: the OTHER half of in-run validity — the concurrent
        # weather trace must show healthy page provisioning (median >=
        # GRAFT_CALM_FT_INRUN MB/s) DURING both timed runs. The round-3 gauge
        # failure mode: steal ~0.2-0.7% (calm_in_run true) while provisioning
        # sat at ~10 MB/s and punished the wide run 3x — steal alone is not
        # validity on a memory-overcommitted host.
        ft_in_run_ok = ft_ok(r_lo) and ft_ok(r_hi)
        pairs.append({
            "host_health_pre": pre_pair_health,
            "calm": is_calm(pre_pair_health),
            "calm_in_run": calm_in_run,
            f"steal_frac_{lo}": r_lo.get("steal_frac"),
            f"steal_frac_{hi}": r_hi.get("steal_frac"),
            f"ft_in_run_{lo}": r_lo.get("ft_in_run"),
            f"ft_in_run_{hi}": r_hi.get("ft_in_run"),
            f"rb_in_run_{lo}": r_lo.get("rb_in_run"),
            f"rb_in_run_{hi}": r_hi.get("rb_in_run"),
            f"sec_{lo}": r_lo["value"], f"sec_{hi}": r_hi["value"],
            f"files_per_sec_{lo}": r_lo["files_per_sec"],
            f"files_per_sec_{hi}": r_hi["files_per_sec"],
            f"stages_{lo}": r_lo.get("stages"), f"stages_{hi}": r_hi.get("stages"),
            f"spilled_mb_{lo}": r_lo.get("spilled_mb"),
            f"spilled_mb_{hi}": r_hi.get("spilled_mb"),
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / (hi / lo), 3),
            "hw_probe_speedup": round(hw_speedup, 3),
            "efficiency_vs_hw": round(speedup / hw_speedup, 3) if hw_speedup else None,
            "ft_in_run_ok": ft_in_run_ok,
            "valid": calm_in_run and ft_in_run_ok,
            "gate_cfg": gate_cfg,
        })
        n_valid += int(pairs[-1]["valid"])
        print(json.dumps(pairs[-1]), file=sys.stderr, flush=True)
        try:
            with open(log_path, "a") as f:
                f.write(json.dumps(pairs[-1]) + "\n")
        except Exception:
            pass
    if not pairs:
        return {"metric": f"scaling efficiency ({lo} -> {hi} CPUs)",
                "runs": [], "error": "no pairs ran (no calm window in budget)"}
    effs = sorted(p["efficiency"] for p in pairs)
    effs_hw = sorted(p["efficiency_vs_hw"] for p in pairs)
    effs_calm = sorted(p["efficiency"] for p in pairs if p["valid"])

    def med(v):
        n = len(v)
        return v[n // 2] if n % 2 else (v[n // 2 - 1] + v[n // 2]) / 2

    return {
        "metric": f"scaling efficiency ({lo} -> {hi} CPUs, same input, {repeats} repeats)",
        "runs": pairs,
        "median_efficiency": round(med(effs), 3),
        "min_efficiency": effs[0],
        "max_efficiency": effs[-1],
        "median_efficiency_vs_hw": round(med(effs_hw), 3),
        "valid_pairs": len(effs_calm),
        "median_efficiency_valid": round(med(effs_calm), 3) if effs_calm else None,
    }


def run_weather_sampler(outfile: str, interval: float = 4.0) -> None:
    """Append {ts, ft, rb} JSON lines until killed: the in-run weather trace
    for scaling runs (started on CPUs outside any pinned bench set).
    ft = first-touch provisioning MB/s (diagnostic); rb = resident read
    MB/s — the decisive signal for a warmed-up timed window."""
    while True:
        ft = first_touch_probe(max_mb=64, max_sec=1.0)
        rb = resident_bw_probe()
        with open(outfile, "a") as f:
            f.write(json.dumps({"ts": round(time.time(), 1), "ft": ft,
                                "rb": rb}) + "\n")
        time.sleep(interval)


if __name__ == "__main__":
    if "--probe" in sys.argv:
        n = int(sys.argv[sys.argv.index("--probe") + 1])
        print(json.dumps(run_probe(n)))
    elif "--bw-probe" in sys.argv:
        n = int(sys.argv[sys.argv.index("--bw-probe") + 1])
        print(json.dumps(run_bw_probe(n)))
    elif "--weather-sampler" in sys.argv:
        run_weather_sampler(sys.argv[sys.argv.index("--weather-sampler") + 1])
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
