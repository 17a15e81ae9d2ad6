"""Per-leg quiet-window watcher (round-5 scaling campaign).

Round-4/5 lesson: one ceiling probe before a ~50-minute scaling.py run is
not enough — the window expires mid-run (round-5 FULL leg: 16-core build
rounds 120.8 s vs 160.1 s, 33% apart).  And the RELATIVE 4->16 ceiling
alone is not enough either: the probe's ABSOLUTE times drifted 4.16 ->
6.24 s (high leg) across one afternoon — the host itself ran ~40% slower,
inflating every "capability" number while the relative ceiling still read
0.92.  Capability (the min over runs that BASELINE.md reports) needs
windows that are quiet in BOTH senses.

So this watcher fires ONE leg subprocess at a time (a single
``scaling.py --leg`` = 2 in-session builds + 3 query batches + 2
sustained rounds, 4-25 min depending on cores/variant), gated on a fresh
probe that must clear BOTH a relative ceiling and an absolute-speed bar,
and probes again right after so every result row carries its in-window
ceilings.  Results append to ``results.jsonl``; ``merge.py`` computes
per-(variant, cores) capability and the efficiency table.

Usage:
    TMPDIR=/dev/shm SPARK_LOCAL_DIRS=/dev/shm/spark \
        python BENCH/watcher.py [out_dir] [legs...]
legs default: lean:16 full:16 lean:4 full:4 lean:16 full:16
(16-core legs outnumber 4-core ones — they are shorter and noisier.)
Env: MIN_CEILING (0.92), MAX_HIGH_SECS (4.7), MAX_LOW_SECS (16.5),
PROBE_SLEEP (180 s), MAX_PROBES_PER_LEG (20 — then fire anyway, flagged).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

MIN_CEILING = float(os.environ.get("MIN_CEILING", "0.92"))
MAX_HIGH_SECS = float(os.environ.get("MAX_HIGH_SECS", "4.7"))
MAX_LOW_SECS = float(os.environ.get("MAX_LOW_SECS", "16.5"))
PROBE_SLEEP = float(os.environ.get("PROBE_SLEEP", "180"))
MAX_PROBES_PER_LEG = int(os.environ.get("MAX_PROBES_PER_LEG", "20"))
N_DOCS = int(os.environ.get("N_DOCS", "300000"))


def log(out: str, msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S', time.gmtime())}] {msg}"
    print(line, flush=True)
    with open(os.path.join(out, "log.txt"), "a") as f:
        f.write(line + "\n")


def probe() -> dict:
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "cpu_ceiling.py"), "4", "16", "2"],
        capture_output=True, text=True, cwd=REPO,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def quiet(p: dict) -> bool:
    return (
        p["ceiling_efficiency"] >= MIN_CEILING
        and p["high_secs"] <= MAX_HIGH_SECS
        and p["low_secs"] <= MAX_LOW_SECS
    )


def ensure_corpus(out: str) -> str:
    os.makedirs("/dev/shm/r5corpus", exist_ok=True)
    pages = os.path.join("/dev/shm/r5corpus", "pages.parquet")
    if not os.path.exists(pages):
        log(out, f"generating {N_DOCS}-doc corpus at {pages}")
        sys.path.insert(0, REPO)
        from iscc_search_spark import corpus

        corpus.write_pages(pages, N_DOCS, seed=42)
    return pages


def run_leg(out: str, variant: str, cores: int, pages: str) -> dict:
    env = dict(os.environ)
    if variant in ("full", "full_combo2"):
        env["SCALING_DERIVED"] = "1"
    if variant == "full_combo2":
        env["SCALING_COMBO2"] = "1"
    work = os.path.join("/dev/shm/r5corpus", f"work_{variant}_{cores}")
    os.makedirs(work, exist_ok=True)
    cmd = [
        "taskset", "-c", f"0-{cores - 1}", sys.executable,
        os.path.join(HERE, "scaling.py"), "--leg", str(cores), pages, work,
    ]
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    if r.returncode != 0:
        log(out, f"LEG FAILED {variant}:{cores}: {r.stderr[-500:]}")
        return {"error": r.stderr[-500:]}
    res = json.loads(r.stdout.strip().splitlines()[-1])
    res["leg_wall_secs"] = round(time.time() - t0, 1)
    return res


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/watcher_r5"
    legs = sys.argv[2:] or [
        "lean:16", "full:16", "lean:4", "full:4", "lean:16", "full:16",
    ]
    os.makedirs(out, exist_ok=True)
    pages = ensure_corpus(out)
    results_path = os.path.join(out, "results.jsonl")

    for spec in legs:
        variant, cores_s = spec.split(":")
        cores = int(cores_s)
        waited = 0
        while True:
            p = probe()
            log(out, f"probe before {spec}: {json.dumps(p)}")
            if quiet(p):
                break
            waited += 1
            if waited >= MAX_PROBES_PER_LEG:
                log(out, f"patience exhausted for {spec}; firing in current window")
                break
            time.sleep(PROBE_SLEEP)
        log(out, f"firing {spec}")
        res = run_leg(out, variant, cores, pages)
        p_after = probe()
        row = {
            "variant": variant, "cores": cores, "result": res,
            "probe_before": p, "probe_after": p_after,
            "quiet": quiet(p) and quiet(p_after),
            "ts": time.strftime("%H:%M:%S", time.gmtime()),
        }
        with open(results_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        log(out, f"{spec} done quiet={row['quiet']}: {json.dumps(res)} after={json.dumps(p_after)}")
    log(out, "all legs complete")


if __name__ == "__main__":
    main()
