"""Island-axis scaling efficiency on the flagship VRP chunk (BASELINE row 2;
round-2 verdict item 6 — beyond-toy multi-process measurement).

Three configs at FIXED resources per island-shard (1 CPU core per device,
enforced with taskset, since this host has 2 cores):

  base   — 1 process, 1 device, I islands          (pinned to core 0)
  ici2   — 1 process, 2 virtual devices, 2I islands (shard_map + ppermute)
  dcn2   — 2 processes x 1 device, 2I islands       (jax.distributed ring)

efficiency_X = moves_per_s(X) / (2 * moves_per_s(base)).

Writes SCALING_r{N}.json. Run: python scripts/measure_scaling.py --out SCALING_r03.json
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "_scaling_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(devices):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices}",
        "PYTHONPATH": REPO,
    })
    env.pop("JAX_NUM_CPU_DEVICES", None)
    return env


def _parse(out):
    for line in out.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"no SCALING_RESULT in output:\n{out}")


def run_single(islands, devices, cores, mesh, seconds, neighbours,
               sweep=False, targets=16, customers=200, depots=4, vehicles=10):
    cmd = ["taskset", "-c", cores, sys.executable, WORKER,
           "--islands", str(islands), "--seconds", str(seconds),
           "--neighbours", str(neighbours),
           "--customers", str(customers), "--depots", str(depots),
           "--vehicles", str(vehicles)]
    if sweep:
        cmd += ["--sweep", "--sweep-targets", str(targets)]
    if mesh:
        cmd.append("--mesh")
    out = subprocess.run(cmd, env=_env(devices), capture_output=True,
                         text=True, timeout=1200)
    assert out.returncode == 0, out.stdout + out.stderr
    return _parse(out.stdout)


def run_two_proc(islands, seconds, neighbours):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    procs = []
    for pid in range(2):
        cmd = ["taskset", "-c", str(pid), sys.executable, WORKER,
               "--islands", str(islands), "--seconds", str(seconds),
               "--neighbours", str(neighbours),
               "--coordinator", coordinator, "--num-processes", "2",
               "--process-id", str(pid)]
        procs.append(subprocess.Popen(cmd, env=_env(1),
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    return _parse(outs[0])


def run_nproc_flagship(nproc, islands_per_proc, seconds, targets,
                       distributed, customers=1000, depots=8, vehicles=40):
    """N concurrent flagship sweep workers, 2 per core (the 4-host stand-in
    on a 2-core host). `distributed=False` runs them INDEPENDENTLY at the
    same core oversubscription — the denominator that isolates collective/
    coordination overhead from CPU contention. Returns summed moves/s."""
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    procs = []
    for pid in range(nproc):
        cmd = ["taskset", "-c", str(pid % 2), sys.executable, WORKER,
               "--islands", str(islands_per_proc), "--seconds", str(seconds),
               "--neighbours", "64", "--sweep",
               "--sweep-targets", str(targets),
               "--customers", str(customers), "--depots", str(depots),
               "--vehicles", str(vehicles)]
        if distributed:
            cmd += ["--coordinator", coordinator,
                    "--num-processes", str(nproc), "--process-id", str(pid)]
            cmd[6] = str(islands_per_proc * nproc)  # global island count
        procs.append(subprocess.Popen(cmd, env=_env(1),
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=2400)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    recs = [_parse(o) for o in outs]
    if distributed:
        # global program: every process reports the global moves/s
        return recs[0], recs
    return {"moves_per_s": round(sum(r["moves_per_s"] for r in recs), 1)}, \
        recs


def run_curve(seconds, targets, customers=1000, depots=8, vehicles=40,
              devices_list=(1, 2, 4, 8)):
    """ONE consistent 1->2->4->8 curve for the flagship sweep chunk
    (VERDICT r4 item 5). This host has 2 physical cores, so a D-device run
    timeshares them; the denominator at each D is D INDEPENDENT 1-device
    processes at the SAME core oversubscription — the ratio isolates
    mesh/collective overhead (the quantity that transfers to TPU ICI) from
    raw CPU contention (a host artifact the TPU does not have)."""
    curve = []
    for d in devices_list:
        coll = run_single(d, d, "0,1", d > 1, seconds, 64, sweep=True,
                          targets=targets, customers=customers,
                          depots=depots, vehicles=vehicles)
        print(f"coll{d}:", coll, flush=True)
        if d == 1:
            indep = {"moves_per_s": coll["moves_per_s"]}
            workers = [coll]
        else:
            port = _free_port()
            procs = []
            for pid in range(d):
                cmd = ["taskset", "-c", str(pid % 2), sys.executable, WORKER,
                       "--islands", "1", "--seconds", str(seconds),
                       "--neighbours", "64", "--sweep",
                       "--sweep-targets", str(targets),
                       "--customers", str(customers),
                       "--depots", str(depots),
                       "--vehicles", str(vehicles)]
                procs.append(subprocess.Popen(cmd, env=_env(1),
                                              stdout=subprocess.PIPE,
                                              stderr=subprocess.STDOUT,
                                              text=True))
            outs = [p.communicate(timeout=2400)[0] for p in procs]
            for p, out in zip(procs, outs):
                assert p.returncode == 0, out
            workers = [_parse(o) for o in outs]
            indep = {"moves_per_s": round(
                sum(r["moves_per_s"] for r in workers), 1)}
            print(f"indep{d}:", indep, flush=True)
        curve.append({
            "devices": d,
            "collective_moves_per_s": coll["moves_per_s"],
            "independent_moves_per_s": indep["moves_per_s"],
            "efficiency_vs_independent": round(
                coll["moves_per_s"] / indep["moves_per_s"], 3),
            "raw_vs_1dev_base": round(
                coll["moves_per_s"] / (d * curve[0]
                                       ["collective_moves_per_s"]), 3)
            if curve else 1.0,
        })
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r03.json")
    ap.add_argument("--islands-per-device", type=int, default=2)
    ap.add_argument("--neighbours", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--curve", action="store_true",
                    help="1->2->4->8 flagship sweep curve only "
                         "(SCALING_r05 deliverable)")
    ap.add_argument("--targets", type=int, default=16)
    args = ap.parse_args()
    ipd = args.islands_per_device

    if args.curve:
        t0 = time.time()
        curve = run_curve(args.seconds, args.targets)
        rec = {
            "workload": ("flagship VRP sweep chunk, synthetic-tw-d8-n1000-"
                         "k40, sweep TabuSearch targets=%d" % args.targets),
            "method": ("collective D-device run vs D independent 1-device "
                       "runs at the SAME 2-core oversubscription; the "
                       "ratio isolates mesh/collective overhead from CPU "
                       "contention (2 physical cores on this host)"),
            "curve": curve,
            "wall_s": round(time.time() - t0, 1),
            "note": ("CPU stand-in for the multi-chip TPU measurement (one "
                     "real chip available); shard_map/ppermute code path "
                     "is identical on TPU ICI"),
        }
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
        print(f"wrote {args.out}", flush=True)
        return

    t0 = time.time()
    base = run_single(ipd, 1, "0", False, args.seconds, args.neighbours)
    print("base:", base, flush=True)
    ici = run_single(2 * ipd, 2, "0,1", True, args.seconds, args.neighbours)
    print("ici2:", ici, flush=True)
    dcn = run_two_proc(2 * ipd, args.seconds, args.neighbours)
    print("dcn2:", dcn, flush=True)
    # 4-process flagship (n=1000, sweep path) — VERDICT r3 item 8. The
    # denominator runs the SAME 4 workers independently at the same 2-per-
    # core oversubscription, so the ratio isolates jax.distributed +
    # collective overhead from raw CPU contention (this host has 2 cores).
    ind4, _ = run_nproc_flagship(4, ipd, args.seconds, 16, False)
    print("indep4:", ind4, flush=True)
    dcn4, _ = run_nproc_flagship(4, ipd, args.seconds, 16, True)
    print("dcn4:", dcn4, flush=True)

    rec = {
        "workload": ("flagship VRP delta chunk, synthetic-tw-d4-n200-k10, "
                     "TabuSearch change+swap"),
        "per_island_resources": "1 CPU core per device shard (taskset)",
        "base_1dev": base,
        "ici_2dev_shardmap": ici,
        "dcn_2proc_distributed": dcn,
        "efficiency_ici_2dev": round(
            ici["moves_per_s"] / (2 * base["moves_per_s"]), 3),
        "efficiency_dcn_2proc": round(
            dcn["moves_per_s"] / (2 * base["moves_per_s"]), 3),
        "flagship_sweep_indep_4proc": ind4,
        "flagship_sweep_dcn_4proc": dcn4,
        "efficiency_dcn_4proc_vs_indep": round(
            dcn4["moves_per_s"] / ind4["moves_per_s"], 3),
        "wall_s": round(time.time() - t0, 1),
        "note": ("CPU stand-in for the 4-host TPU measurement (one real "
                 "chip available); shard_map/ppermute code path is "
                 "identical on TPU ICI"),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
