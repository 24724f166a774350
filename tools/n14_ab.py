#!/usr/bin/env python3
"""Converged 1-vs-4-core scaling over frontier SIZE for the bucketed
(exchange-free) round — the round-5 "does per-URL cost stay flat at 4x
N" evidence. The full-harness 40M run (BENCH_40M_DETAIL.json) fit only
2 rounds/side inside its 900 s budget and both sides were still
descending (c4 76->62 s, c1 253->141 s); this runs each (N, cores)
child until min-of-rounds converges (R rounds), interleaved in the
same window like tools/n_ab.py so ambient noise hits both sides.

Reuses the Bench parent's bucketed tables
(/tmp/graft-bench-frontier-v2-<N>-10000-64-bucketed) when present,
else writes the same layout via graft.tools.FrontierWrite.

Usage: n14_ab.py [rounds] [N ...]   (defaults: 6 rounds; 10M 40M)
"""
import subprocess, sys, re, os

HOSTS = "10000"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
NS = sys.argv[2:] if len(sys.argv) > 2 else ["10000000", "40000000"]
CORES = (1, 4)
MEM = os.environ.get("N14_MEM", "12g")

CP = open("/tmp/graft_cp.txt").read().strip()
OPENS = [f"--add-opens=java.base/{m}=ALL-UNNAMED" for m in
         ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch",
          "sun.nio.cs", "sun.security.action", "sun.util.calendar"]]


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def table(n):
    bench = f"/tmp/graft-bench-frontier-v2-{n}-{HOSTS}-64-bucketed"
    if os.path.exists(os.path.join(bench, "_SUCCESS")):
        return bench
    path = f"/tmp/graft-nab-{n}-bucketed"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        subprocess.run(
            ["java", f"-Xmx{MEM}", *OPENS, "-cp", CP,
             "graft.tools.FrontierWrite", path, n, HOSTS, "bucketed"],
            check=True, cwd="/root/repo",
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        print(f"N={n}: bucketed table written", flush=True)
    return path


def spawn(cores, n, path):
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_FRONTIER_PATH", None)
    env["SPARK_GRAFT_FRONTIER_BUCKETED"] = path
    return subprocess.Popen(
        ["java", f"-Xmx{MEM}", f"-Xms{MEM}", *OPENS, "-cp", CP,
         "graft.BenchRound", str(cores), n, HOSTS],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=env, cwd="/root/repo")


summary = []
for n in NS:
    path = table(n)
    procs = {c: spawn(c, n, path) for c in CORES}
    for c, p in procs.items():
        for line in p.stdout:
            if line.strip() == "READY":
                break
    results = {c: [] for c in procs}
    for r in range(ROUNDS):
        for c in CORES[::-1]:
            p = procs[c]
            s0 = steal()
            p.stdin.write("go\n")
            p.stdin.flush()
            m = re.search(r"ROUND_SEC=([0-9.]+)", p.stdout.readline())
            sec = float(m.group(1))
            results[c].append(sec)
            print(f"N={n} round {r+1} c{c}: {sec:.2f}s "
                  f"steal={steal()-s0:.2f}", flush=True)
    for p in procs.values():
        try:
            p.stdin.close()
            p.wait(timeout=30)
        except Exception:
            p.kill()
    lo, hi = min(results[1]), min(results[4])
    med_lo = sorted(results[1])[len(results[1]) // 2]
    summary.append((n, lo, med_lo, hi))

print()
for n, lo, med_lo, hi in summary:
    print(f"N={n}: c1 min {lo:.2f} med {med_lo:.2f}  c4 min {hi:.2f}  "
          f"eff(min/min) {lo / (4 * hi):.3f}  eff(med/min) {med_lo / (4 * hi):.3f}  "
          f"urls/s@4 {int(float(n) / hi)}  us/url@4core {4e6 * hi / float(n):.3f}",
          flush=True)
