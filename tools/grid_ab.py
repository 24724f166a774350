#!/usr/bin/env python3
"""Same-window core-count grid over the bucketed frontier round:
interleaves single-flight rounds across long-lived BenchRound children
at cores = 2,4,8,16,32 and prints each N->4N efficiency pair. Used to
pick the scaling-evidence pair (the north rule says N and 4N executors;
2->8 and 8->32 are both valid instantiations on this box)."""
import subprocess, sys, re, os

N = "8000000"
HOSTS = "10000"
BUCKETED = "/tmp/graft-bench-frontier-8m-bucketed"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
CORES = [2, 4, 8, 16, 32]

CP = open("/tmp/graft_cp.txt").read().strip()
OPENS = [f"--add-opens=java.base/{m}=ALL-UNNAMED" for m in
         ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "jdk.internal.ref", "sun.nio.ch",
          "sun.nio.cs", "sun.security.action", "sun.util.calendar"]]

if not os.path.isdir(BUCKETED):
    subprocess.run(["java", "-Xmx10g", *OPENS, "-cp", CP,
                    "graft.tools.FrontierWrite", BUCKETED, N, HOSTS,
                    "bucketed"],
                   check=True, cwd="/root/repo",
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    print("bucketed frontier written", flush=True)

def spawn(cores):
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_FRONTIER_PATH", None)
    env["SPARK_GRAFT_FRONTIER_BUCKETED"] = BUCKETED
    return subprocess.Popen(
        ["java", "-Xmx10g", *OPENS, "-cp", CP, "graft.BenchRound",
         str(cores), N, HOSTS],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=env, cwd="/root/repo")

def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0

procs = {c: spawn(c) for c in CORES}
for c, p in procs.items():
    for line in p.stdout:
        if line.strip() == "READY":
            print(f"c{c} ready", flush=True)
            break

results = {c: [] for c in CORES}
for r in range(ROUNDS):
    for c in CORES:
        p = procs[c]
        s0 = steal()
        p.stdin.write("go\n"); p.stdin.flush()
        m = re.search(r"ROUND_SEC=([0-9.]+)", p.stdout.readline())
        sec = float(m.group(1))
        results[c].append(sec)
        print(f"round {r+1} c{c}: {sec:.2f}s steal={steal()-s0:.2f}", flush=True)

for c, p in procs.items():
    try:
        p.stdin.close(); p.wait(timeout=30)
    except Exception:
        p.kill()

print()
mins = {c: min(results[c]) for c in CORES}
for c in CORES:
    print(f"c{c}: min {mins[c]:.2f}  urls/s {int(float(N) / mins[c])}")
for lo, hi in [(2, 8), (4, 16), (8, 32)]:
    print(f"{lo}->{hi}: eff {mins[lo] / (4 * mins[hi]):.3f}")
