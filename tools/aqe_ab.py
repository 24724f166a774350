#!/usr/bin/env python3
"""Same-window A/B: frontier-round time at c2/c8 with AQE on/off.

Spawns four long-lived BenchRound children (cores x AQE), overlapping
warm-ups, then issues single-flight rounds round-robin so every config
samples the same host window. Prints per-round times and the min-based
efficiency for both AQE settings.
"""
import subprocess, sys, time, itertools, re, os

N = "8000000"
HOSTS = "10000"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

cp = subprocess.run(["sbt", "-batch", "export Runtime/fullClasspath"],
                    capture_output=True, text=True, cwd="/root/repo")
cpline = [l for l in cp.stdout.splitlines() if "/classes" in l or l.count(":") > 5][-1].strip()

def spawn(cores, aqe):
    env = dict(os.environ, SPARK_GRAFT_AQE=aqe)
    p = subprocess.Popen(
        ["java", "-Xmx10g",
         "--add-opens=java.base/java.lang=ALL-UNNAMED",
         "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
         "--add-opens=java.base/java.lang.reflect=ALL-UNNAMED",
         "--add-opens=java.base/java.io=ALL-UNNAMED",
         "--add-opens=java.base/java.net=ALL-UNNAMED",
         "--add-opens=java.base/java.nio=ALL-UNNAMED",
         "--add-opens=java.base/java.util=ALL-UNNAMED",
         "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
         "--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED",
         "--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED",
         "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
         "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
         "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
         "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
         "-cp", cpline, "graft.BenchRound", str(cores), N, HOSTS],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, env=env, cwd="/root/repo")
    return p

def wait_ready(p, tag):
    for line in p.stdout:
        if line.strip() == "READY":
            print(f"{tag} ready", flush=True)
            return
    raise RuntimeError(f"{tag} died")

def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0

configs = [(2, "true"), (2, "false"), (8, "true"), (8, "false")]
procs = {}
for cores, aqe in configs:
    procs[(cores, aqe)] = spawn(cores, aqe)
# warm-ups overlap (they contend, but warm-up time is discarded)
for (cores, aqe), p in procs.items():
    wait_ready(p, f"c{cores}-aqe{aqe}")

results = {k: [] for k in procs}
for r in range(ROUNDS):
    for key in configs:
        p = procs[key]
        s0 = steal()
        p.stdin.write("go\n"); p.stdin.flush()
        line = p.stdout.readline()
        m = re.search(r"ROUND_SEC=([0-9.]+)", line)
        sec = float(m.group(1))
        ds = steal() - s0
        results[key].append(sec)
        print(f"round {r+1} c{key[0]} aqe={key[1]}: {sec:.2f}s steal={ds:.2f}", flush=True)

for p in procs.values():
    p.stdin.close()

for aqe in ("true", "false"):
    lo = min(results[(2, aqe)]); hi = min(results[(8, aqe)])
    print(f"AQE={aqe}: c2min={lo:.2f} c8min={hi:.2f} eff={lo/(4*hi):.4f}", flush=True)
