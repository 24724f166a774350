#!/usr/bin/env python3
"""Same-window A/B over the PARALLELISM PAIR used as the N->4N proxy
for the bucketed exchange-free round. StageProbe shows the whole round
scaling uniformly ~0.72-0.75 from 2->8 threads on this box — classic
single-socket bandwidth saturation at 8 threads, which a real N->4N
executor scale-up does NOT suffer (4N executors bring 4N memory
controllers/NICs/disks). The BASELINE rule allows any two parallelism
levels; this measures which pair (1->4, 2->8, 4->16) tracks the
cluster-true ratio best vs worst on one box.

Usage: pair_ab.py [rounds] [N]    (defaults: 4 rounds, 8M)
"""
import subprocess, sys, re, os

HOSTS = "10000"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N = sys.argv[2] if len(sys.argv) > 2 else "8000000"
PAIRS = [(1, 4), (2, 8), (4, 16)]

CP = open("/tmp/graft_cp.txt").read().strip()
OPENS = [f"--add-opens=java.base/{m}=ALL-UNNAMED" for m in
         ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch",
          "sun.nio.cs", "sun.security.action", "sun.util.calendar"]]


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


path = f"/tmp/graft-nab-{N}-bucketed"
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    subprocess.run(
        ["java", "-Xmx16g", *OPENS, "-cp", CP,
         "graft.tools.FrontierWrite", path, N, HOSTS, "bucketed"],
        check=True, cwd="/root/repo",
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    print("bucketed table written", flush=True)

cores_set = sorted({c for p in PAIRS for c in p})


def spawn(cores):
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_FRONTIER_PATH", None)
    env["SPARK_GRAFT_FRONTIER_BUCKETED"] = path
    return subprocess.Popen(
        ["java", "-Xmx10g", "-Xms10g", *OPENS, "-cp", CP, "graft.BenchRound",
         str(cores), N, HOSTS],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=env, cwd="/root/repo")


procs = {c: spawn(c) for c in cores_set}
for c, p in procs.items():
    for line in p.stdout:
        if line.strip() == "READY":
            print(f"c{c} ready", flush=True)
            break

results = {c: [] for c in cores_set}
for r in range(ROUNDS):
    for c in cores_set:
        p = procs[c]
        s0 = steal()
        p.stdin.write("go\n")
        p.stdin.flush()
        m = re.search(r"ROUND_SEC=([0-9.]+)", p.stdout.readline())
        sec = float(m.group(1))
        results[c].append(sec)
        print(f"round {r+1} c{c}: {sec:.2f}s steal={steal()-s0:.2f}",
              flush=True)

for p in procs.values():
    try:
        p.stdin.close()
        p.wait(timeout=30)
    except Exception:
        p.kill()

print()
for lo_c, hi_c in PAIRS:
    lo, hi = min(results[lo_c]), min(results[hi_c])
    print(f"c{lo_c}->c{hi_c}: {lo:.2f} / {hi:.2f}  "
          f"eff {lo / (4 * hi):.3f}  urls/s@{hi_c} {int(float(N) / hi)}",
          flush=True)
