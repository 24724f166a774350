#!/usr/bin/env python3
"""Same-window A/B: frontier round over a plain 64-way parquet table
(explicit repartition(host) exchange) vs a bucketed table CLUSTERED BY
host (exchange-free clustered round), at c2/c8.

Pre-writes both tables from the same synthetic seed, then interleaves
single-flight rounds across four long-lived BenchRound children. AQE
off (the BenchRound default)."""
import subprocess, sys, re, os

N = "8000000"
HOSTS = "10000"
PLAIN = "/tmp/graft-bench-frontier-8m"
BUCKETED = "/tmp/graft-bench-frontier-8m-bucketed"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

CP = open("/tmp/graft_cp.txt").read().strip()
OPENS = [f"--add-opens=java.base/{m}=ALL-UNNAMED" for m in
         ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "jdk.internal.ref", "sun.nio.ch",
          "sun.nio.cs", "sun.security.action", "sun.util.calendar"]]

for path, mode in [(PLAIN, "plain"), (BUCKETED, "bucketed")]:
    args = ["java", "-Xmx10g", *OPENS, "-cp", CP,
            "graft.tools.FrontierWrite", path, N, HOSTS]
    if mode == "bucketed":
        args.append("bucketed")
    subprocess.run(args, check=True, cwd="/root/repo",
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    print(f"{mode} frontier written", flush=True)

def spawn(cores, src):
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_FRONTIER_PATH", None)
    env.pop("SPARK_GRAFT_FRONTIER_BUCKETED", None)
    if src == "plain":
        env["SPARK_GRAFT_FRONTIER_PATH"] = PLAIN
    else:
        env["SPARK_GRAFT_FRONTIER_BUCKETED"] = BUCKETED
    return subprocess.Popen(
        ["java", "-Xmx10g", *OPENS, "-cp", CP, "graft.BenchRound",
         str(cores), N, HOSTS],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=env, cwd="/root/repo")

def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0

configs = [(2, "plain"), (2, "bucketed"), (8, "plain"), (8, "bucketed")]
procs = {k: spawn(*k) for k in configs}
for k, p in procs.items():
    for line in p.stdout:
        if line.strip() == "READY":
            print(f"{k} ready", flush=True)
            break

results = {k: [] for k in configs}
for r in range(ROUNDS):
    for k in configs:
        p = procs[k]
        s0 = steal()
        p.stdin.write("go\n"); p.stdin.flush()
        m = re.search(r"ROUND_SEC=([0-9.]+)", p.stdout.readline())
        sec = float(m.group(1))
        results[k].append(sec)
        print(f"round {r+1} c{k[0]} {k[1]}: {sec:.2f}s steal={steal()-s0:.2f}",
              flush=True)

for k, p in procs.items():
    try:
        p.stdin.close(); p.wait(timeout=30)
    except Exception:
        p.kill()

print()
for src in ("plain", "bucketed"):
    lo = min(results[(2, src)])
    hi = min(results[(8, src)])
    print(f"{src}: c2 {lo:.2f}  c8 {hi:.2f}  eff {lo / (4 * hi):.3f}  "
          f"urls/s@8 {int(float(N) / hi)}", flush=True)
