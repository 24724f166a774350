#!/usr/bin/env python3
"""Same-window A/B: frontier round from synth vs parquet scan, c2/c8.

Pre-writes the 8M frontier parquet (64-way layout), then interleaves
single-flight rounds across four long-lived children. AQE off (the
BenchRound default)."""
import subprocess, sys, re, os

N = "8000000"
HOSTS = "10000"
PATH = "/tmp/graft-bench-frontier-8m"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

CP = open("/tmp/graft_cp.txt").read().strip()
OPENS = [f"--add-opens=java.base/{m}=ALL-UNNAMED" for m in
         ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "jdk.internal.ref", "sun.nio.ch",
          "sun.nio.cs", "sun.security.action", "sun.util.calendar"]]

subprocess.run(["java", "-Xmx10g", *OPENS, "-cp", CP,
                "graft.tools.FrontierWrite", PATH, N, HOSTS],
               check=True, cwd="/root/repo",
               stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
print("frontier written", flush=True)

def spawn(cores, src):
    env = dict(os.environ)
    if src == "parquet":
        env["SPARK_GRAFT_FRONTIER_PATH"] = PATH
    else:
        env.pop("SPARK_GRAFT_FRONTIER_PATH", None)
    return subprocess.Popen(
        ["java", "-Xmx10g", *OPENS, "-cp", CP, "graft.BenchRound",
         str(cores), N, HOSTS],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=env, cwd="/root/repo")

def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0

configs = [(2, "synth"), (2, "parquet"), (8, "synth"), (8, "parquet")]
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
        print(f"round {r+1} c{k[0]} {k[1]}: {sec:.2f}s steal={steal()-s0:.2f}", flush=True)

for p in procs.values():
    p.stdin.close()
for src in ("synth", "parquet"):
    lo, hi = min(results[(2, src)]), min(results[(8, src)])
    print(f"src={src}: c2min={lo:.2f} c8min={hi:.2f} eff={lo/(4*hi):.4f} "
          f"urls/s@8={int(8000000/hi)}", flush=True)
