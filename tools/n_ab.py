#!/usr/bin/env python3
"""Same-window A/B over frontier SIZE for the bucketed (exchange-free)
round: the r04.1 driver run measured eff 0.716 at N=8M because the
bucketed round got 3x faster and the ~1.6 s FIXED per-round cost
(driver planning, job scheduling, hot-count job) Amdahl-caps the 2->8
ratio: t2 = f + W/2, t8 = f + W/8 with f~1.6, W~20.6 at 8M.  Growing N
grows W while f stays flat, so the model predicts eff(16M)~0.82,
eff(24M)~0.87.  This measures it: for each N, one bucketed table, one
c2 + one c8 child, R rounds each interleaved, min-of-rounds.

Usage: n_ab.py [rounds] [N ...]   (defaults: 4 rounds; 8M 16M 24M)
"""
import subprocess, sys, re, os

HOSTS = "10000"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
NS = sys.argv[2:] if len(sys.argv) > 2 else ["8000000", "16000000", "24000000"]

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
    path = f"/tmp/graft-nab-{n}-bucketed"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        subprocess.run(
            ["java", "-Xmx16g", *OPENS, "-cp", CP,
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
        ["java", "-Xmx10g", "-Xms10g", *OPENS, "-cp", CP, "graft.BenchRound",
         str(cores), n, HOSTS],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=env, cwd="/root/repo")


summary = []
for n in NS:
    path = table(n)
    procs = {c: spawn(c, n, path) for c in (2, 8)}
    for c, p in procs.items():
        for line in p.stdout:
            if line.strip() == "READY":
                break
    results = {c: [] for c in procs}
    for r in range(ROUNDS):
        for c in (8, 2):
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
    lo, hi = min(results[2]), min(results[8])
    summary.append((n, lo, hi))

print()
for n, lo, hi in summary:
    print(f"N={n}: c2 {lo:.2f}  c8 {hi:.2f}  eff {lo / (4 * hi):.3f}  "
          f"urls/s@8 {int(float(n) / hi)}", flush=True)
