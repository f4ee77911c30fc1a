#!/usr/bin/env python3
"""Scale-leg correctness sweep with per-oracle timeouts (dev/driver tool).

The driver's gate proves rows+schema+hash at sf0.01; BASELINE carries
the same sweep at sf0.1 and sf1 (x10). This tool extends the proof to
arbitrary scale dirs (the x100 /tmp/graft_sf10 leg) where SOME DuckDB
oracle replays stop being affordable -- the Spark side ran the full
suite at x100 in 1,840 s (BENCH_DETAIL_r11_sf10_full), but a handful
of oracle CTEs (pair self-joins, unrolled LPA rounds) are super-linear
in DuckDB. Each oracle therefore runs in its OWN subprocess under a
wall timeout: a query whose oracle exceeds the budget is recorded as
"skipped": "oracle_timeout" -- an honest cost statement about the
ORACLE, never silently dropped and never counted as a pass.

Output: a CORRECTNESS_r{N}-shaped JSON (rows/schema/hash booleans per
query) plus "skipped" entries, written to the path in argv[3].

Usage: tools/check_scale.py SF_DIR VERIFY_OUT_DIR ARTIFACT_JSON
       [--timeout SEC] [--threads N] [--jobs N] [--mem GB]
       [--only q_a,q_b]

--mem caps each oracle's DuckDB at N GB with a disk spill dir (heavy
oracles degrade to spill instead of OOM); --only re-runs a subset
(e.g. the serial drain of a previous sweep's resource skips).
"""
import json
import multiprocessing as mp
import os
import sys
import glob


def compare_one(sf_dir, out_dir, name, sql, threads, q, mem_gb=0):
    """Subprocess body: run the DuckDB oracle, compare with the Spark
    parquet, put a result dict on the queue. Mirrors tools/check.py's
    compare exactly (columns sorted by name, rows sorted, float64
    round-trip) so a pass here means the same thing as a driver pass.
    """
    try:
        import duckdb
        import pandas as pd

        def norm(df):
            df = df.reindex(sorted(df.columns), axis=1)
            for c in df.columns:
                if pd.api.types.is_datetime64_any_dtype(df[c]):
                    df[c] = df[c].astype("datetime64[us]")
                elif pd.api.types.is_integer_dtype(df[c]):
                    df[c] = df[c].astype("Int64")
                elif pd.api.types.is_float_dtype(df[c]):
                    df[c] = df[c].astype("float64")
            return df.sort_values(by=list(df.columns), ignore_index=True)

        con = duckdb.connect()
        con.execute(f"SET threads={threads}")
        spill = None
        if mem_gb:
            # cap + spill dir: a heavy oracle (the r12 q_dedup_reps row
            # OOM'd the box at 100 GiB under 4-way parallel) degrades
            # to disk spill instead of taking down the allocator
            spill = f"{out_dir}/.duckdb_spill_{name}"
            os.makedirs(spill, exist_ok=True)
            con.execute(f"SET memory_limit='{mem_gb}GB'")
            con.execute(f"SET temp_directory='{spill}'")
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"]:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            q.put({"skipped": "no_spark_output"})
            return
        got = norm(pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True))
        want = norm(con.execute(sql).fetchdf())
        res = {
            "rows_match": len(want) == len(got),
            "schema_match": list(want.columns) == list(got.columns),
            "hash_match": False,
            "spark_rows": int(len(got)),
            "oracle_rows": int(len(want)),
            "err": None,
        }
        if res["rows_match"] and res["schema_match"]:
            ok = True
            for c in want.columns:
                w, g = want[c], got[c]
                same = (w.isna() & g.isna()) | (w == g)
                if not bool(same.all()):
                    bad = int((~same).idxmax())
                    res["err"] = (f"col {c} differs at row {bad}: "
                                  f"want={w[bad]!r} got={g[bad]!r} "
                                  f"({int((~same).sum())} rows)")
                    ok = False
                    break
            res["hash_match"] = ok
        if spill:
            con.close()
            import shutil
            shutil.rmtree(spill, ignore_errors=True)
        q.put(res)
    except Exception as e:  # noqa: BLE001 - recorded, never raised
        # reap the spill dir on FAILURE too — a failed heavy oracle
        # can leave >50 GB behind and starve every later spill
        if mem_gb:
            import shutil
            shutil.rmtree(f"{out_dir}/.duckdb_spill_{name}",
                          ignore_errors=True)
        msg = f"{type(e).__name__}: {e}"
        low = msg.lower()
        # an ORACLE resource failure is a cost statement about DuckDB,
        # not a correctness verdict about the Spark result — record it
        # as a skip (VERDICT r12 #2: the OOM'd q_dedup_reps row was
        # misrecorded as rows_match:false, i.e. a fail)
        if ("out of memory" in low or "memory limit" in low
                or "could not allocate" in low or "bad_alloc" in low):
            q.put({"skipped": "oracle_oom", "err": msg[:300]})
        elif "no space left" in low:
            # spill-to-disk exhausted the volume — same resource class
            q.put({"skipped": "oracle_disk_full", "err": msg[:300]})
        else:
            q.put({"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": None,
                   "oracle_rows": None,
                   "err": msg[:300]})


def main(argv):
    sf_dir, out_dir, artifact = argv[1], argv[2], argv[3]
    timeout = 600
    threads = os.cpu_count() or 8
    jobs = 1
    if "--timeout" in argv:
        timeout = int(argv[argv.index("--timeout") + 1])
    if "--threads" in argv:
        threads = int(argv[argv.index("--threads") + 1])
    if "--jobs" in argv:
        jobs = int(argv[argv.index("--jobs") + 1])
    mem_gb = 0
    if "--mem" in argv:
        mem_gb = int(argv[argv.index("--mem") + 1])
    only = None
    if "--only" in argv:
        only = set(argv[argv.index("--only") + 1].split(","))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results, n_pass, n_fail, n_skip = {}, 0, 0, 0

    def record(name, res, exitcode=None):
        nonlocal n_pass, n_fail, n_skip
        if res is None:
            # -9 = the kernel OOM-killer reaped the oracle subprocess:
            # a resource skip, same class as an in-process OOM
            reason = ("oracle_oom" if exitcode == -9
                      else "oracle_crashed")
            results[name] = {"skipped": reason,
                             "exitcode": exitcode}
            n_skip += 1
            print(f"SKIP {name}: oracle subprocess died "
                  f"(exitcode {exitcode}, {reason})", flush=True)
        elif "skipped" in res:
            results[name] = res
            n_skip += 1
            print(f"SKIP {name}: {res['skipped']}", flush=True)
        elif res.get("hash_match"):
            results[name] = res
            n_pass += 1
            print(f"PASS {name} ({res['spark_rows']} rows)", flush=True)
        else:
            results[name] = res
            n_fail += 1
            print(f"FAIL {name}: {res.get('err') or 'rows/schema mismatch'}"
                  f" spark={res.get('spark_rows')}"
                  f" oracle={res.get('oracle_rows')}", flush=True)

    # Bounded worker pool over one-oracle-per-subprocess (timeouts on
    # heavy oracles overlap instead of serializing the whole sweep);
    # each subprocess runs DuckDB with `threads` so jobs*threads ~ CPUs.
    import time
    pending = sorted(oracle if only is None
                     else [n for n in oracle if n in only])
    running = []  # (name, proc, queue, deadline)
    while pending or running:
        while pending and len(running) < jobs:
            name = pending.pop(0)
            q = mp.Queue()
            p = mp.Process(target=compare_one,
                           args=(sf_dir, out_dir, name, oracle[name],
                                 threads, q, mem_gb))
            p.start()
            running.append((name, p, q, time.monotonic() + timeout))
        time.sleep(0.2)
        still = []
        for name, p, q, deadline in running:
            if not p.is_alive():
                p.join()
                # the mp.Queue feeder thread can still be flushing when
                # is_alive() flips false — a blocking get with a grace
                # period avoids misrecording a passing oracle as crashed
                try:
                    res = q.get(timeout=2)
                except Exception:
                    res = None
                record(name, res, p.exitcode)
            elif time.monotonic() > deadline:
                p.terminate()
                p.join()
                # a terminated oracle never reaches its own spill-dir
                # cleanup — tens of GB can linger and starve the NEXT
                # heavy oracle's spill (observed r13: two killed
                # 15 GB/7 GB dirs tipped a later 4-way window into
                # no-space)
                if mem_gb:
                    import shutil
                    shutil.rmtree(f"{out_dir}/.duckdb_spill_{name}",
                                  ignore_errors=True)
                record(name, {"skipped": "oracle_timeout",
                              "timeout_sec": timeout})
            else:
                still.append((name, p, q, deadline))
        running = still
    summary = {"sf_dir": sf_dir, "out_dir": out_dir,
               "timeout_sec": timeout,
               "n_pass": n_pass, "n_fail": n_fail, "n_skip": n_skip,
               "results": results}
    with open(artifact, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip -> {artifact} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
