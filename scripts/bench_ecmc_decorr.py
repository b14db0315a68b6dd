#!/usr/bin/env python
"""Decorrelation-per-wall-second: Metropolis engine vs ECMC (VERDICT r3 #6).

Measures the coherent intermediate scattering function F(k*, t) at the
structure-factor peak k* — the standard structural-relaxation observable —
as a function of WALL TIME for three samplers on the same equilibrated
hard-disk system:

  metropolis   the flagship fused Pallas engine (grid shifts + local moves)
  ecmc         straight serial event chains (ops/ecmc.py run_ecmc)
  strips       strip-confined parallel chains (run_ecmc_parallel)

The Metropolis engine's grid shifts drift the stored frame; snapshots are
frame-corrected exactly via extfield.replay_origin (rho_phys =
exp(i k.origin) rho_stored; tests/test_decorr.py).  ECMC legs never shift,
so their frame is constant and cancels in F.

tau_wall = wall seconds to F = 1/e (log-interpolated).  decorr/s = 1/tau.
Also reports raw engine rates (trial moves/s, lift events/s, displacement/s)
so the PERF.md row carries both the throughput and the honest
decorrelation-rate comparison.

Run on the TPU:
  python scripts/bench_ecmc_decorr.py --n 65536 --phi 0.60
  python scripts/bench_ecmc_decorr.py --n 65536 --phi 0.71 --chunk-sweeps 128

CPU smoke (tiny, XLA engine, interpret-free):
  JAX_PLATFORMS=cpu python scripts/bench_ecmc_decorr.py --n 4096 --smoke
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp
import numpy as np

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere
from mcjax.ops.extfield import replay_origin
from mcjax.ops.pallas_sweep import run_sweeps_pallas
from mcjax.ops.sweep import run_sweeps
from mcjax.utils.observables import rho_k_cells


def shell_k_vectors(box: float, k_star: float, n_dirs: int) -> np.ndarray:
    """~n_dirs reciprocal-lattice vectors nearest the |k| = k_star shell,
    spread in angle (upper half-plane; -k is redundant for F)."""
    b = 2.0 * math.pi / box
    out, seen = [], set()
    for i in range(n_dirs):
        th = math.pi * (i + 0.5) / n_dirs
        nx = round(k_star * math.cos(th) / b)
        ny = round(k_star * math.sin(th) / b)
        if (nx, ny) not in seen and (nx, ny) != (0, 0):
            seen.add((nx, ny))
            out.append((nx * b, ny * b))
    return np.asarray(out, np.float32)


def f_of_lag(rhos: np.ndarray) -> np.ndarray:
    """Normalized F(lag) from [T, K, 2] frame-corrected snapshots, averaged
    over all time origins and k."""
    z = rhos[..., 0] + 1j * rhos[..., 1]                    # [T, K]
    t = z.shape[0]
    norm = np.mean((z * z.conj()).real)
    out = np.empty(t)
    for lag in range(t):
        c = (z[:t - lag] * z[lag:].conj()).real             # [T-lag, K]
        out[lag] = np.mean(c) / norm
    return out


def tau_from_f(f: np.ndarray) -> float:
    """First 1/e crossing in units of the snapshot interval (log-interp);
    inf if no crossing."""
    e1 = 1.0 / math.e
    for i in range(1, len(f)):
        if f[i] < e1:
            a, b = max(f[i - 1], 1e-9), max(f[i], 1e-9)
            if a <= e1:
                return float(i)
            frac = (math.log(a) - math.log(e1)) / (math.log(a) - math.log(b))
            return float(i - 1 + frac)
    return float("inf")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--phi", type=float, default=0.60)
    ap.add_argument("--eq-sweeps", type=int, default=2048)
    ap.add_argument("--snapshots", type=int, default=33,
                    help="snapshots per leg (incl. t=0)")
    ap.add_argument("--chunk-sweeps", type=int, default=32,
                    help="metropolis sweeps between snapshots")
    ap.add_argument("--chains-per-chunk", type=int, default=4,
                    help="serial ECMC chains between snapshots")
    ap.add_argument("--ell-frac", type=float, default=0.25,
                    help="serial chain displacement budget / box length")
    ap.add_argument("--rounds-per-chunk", type=int, default=2,
                    help="strip-ECMC rounds between snapshots")
    ap.add_argument("--strips", type=int, default=0,
                    help="strip count (0 = cps/8)")
    ap.add_argument("--n-dirs", type=int, default=48)
    ap.add_argument("--legs", type=str, default="metropolis,ecmc,strips")
    ap.add_argument("--engine", choices=["fused", "xla"], default="fused")
    ap.add_argument("--ih-k", type=int, default=8)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU run: xla engine, few snapshots")
    ap.add_argument("--json-out", type=str, default="")
    args = ap.parse_args()
    if args.smoke:
        args.engine = "xla"
        args.snapshots = min(args.snapshots, 9)
        args.eq_sweeps = min(args.eq_sweeps, 64)

    n, phi = args.n, args.phi
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 4
    # nmax for w ~ 2: ~4 disks/cell at phi=0.5; headroom for density + shift
    dens_per_cell = phi * 4.0 / math.pi * (box / cps) ** 2
    nmax = max(7, int(dens_per_cell * 2.5) + 2)
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=nmax, n_moves=8, proposal="uniform",
                    step_size=0.18 if phi <= 0.65 else 0.10, beta=1.0,
                    seed=11)
    pot = HardSphere(1.0)
    on_tpu = jax.devices()[0].platform != "cpu"
    use_fused = args.engine == "fused" and on_tpu

    def metro_chunk(st, n_sweeps):
        if use_fused:
            return run_sweeps_pallas(cfg, pot, st, n_sweeps, 16, 128, False,
                                     False, 2, 1, True, True, args.ih_k)
        return run_sweeps(cfg, pot, st, n_sweeps)

    def sync(x):
        return float(jnp.sum(x))

    print(f"# n={n} phi={phi} box={box:.1f} cps={cps} nmax={nmax} "
          f"engine={'fused' if use_fused else 'xla'}", flush=True)

    # ---- equilibrate (chunked through the same compiled fn) ---------------
    state = init_state(cfg)
    t0 = time.perf_counter()
    eq_chunks = max(1, args.eq_sweeps // args.chunk_sweeps)
    for _ in range(eq_chunks):
        state, m = metro_chunk(state, args.chunk_sweeps)
    acc = sync(m.accepted) / max(sync(m.proposed), 1.0)
    assert not bool(jnp.any(state.overflow)), "overflow during equilibration"
    print(f"# equilibrated {eq_chunks * args.chunk_sweeps} sweeps in "
          f"{time.perf_counter() - t0:.1f}s (acceptance {acc:.3f})",
          flush=True)

    # ---- k* shell ----------------------------------------------------------
    # first S(k) peak of a dense 2D hard-disk fluid sits at k*sigma ~ 2 pi /
    # r_nn; probe a band around the analytic estimate and pick the measured
    # argmax so the shell tracks the true cage scale at this phi
    rho_num = n / box ** 2
    r_nn = math.sqrt(2.0 / (math.sqrt(3.0) * rho_num))
    k_est = 2.0 * math.pi / r_nn
    cand = [k_est * (0.80 + 0.05 * i) for i in range(9)]
    kv_cand = np.concatenate([shell_k_vectors(box, k, 12) for k in cand])
    sk = np.asarray(rho_k_cells(cfg, state.pos, state.occ,
                                jnp.asarray(kv_cand)))
    s_of_k = (sk ** 2).sum(-1) / n
    kabs = np.sqrt((kv_cand ** 2).sum(-1))
    # bin by candidate ring, take the ring with max mean S
    rings = np.digitize(kabs, [0.5 * (cand[i] + cand[i + 1])
                               for i in range(len(cand) - 1)])
    means = [s_of_k[rings == i].mean() if np.any(rings == i) else 0.0
             for i in range(len(cand))]
    k_star = cand[int(np.argmax(means))]
    kv = jnp.asarray(shell_k_vectors(box, k_star, args.n_dirs))
    print(f"# k* = {k_star:.3f} (S~{max(means):.2f}, {kv.shape[0]} vectors)",
          flush=True)

    rho_fn = jax.jit(lambda p, o: rho_k_cells(cfg, p, o, kv))
    kv_np = np.asarray(kv)

    def corrected(state, origin_np):
        r = np.asarray(rho_fn(state.pos, state.occ))        # [K, 2]
        ph = kv_np @ origin_np
        c, s = np.cos(ph), np.sin(ph)
        return np.stack([c * r[:, 0] - s * r[:, 1],
                         s * r[:, 0] + c * r[:, 1]], axis=-1)

    results = {}
    legs = [x.strip() for x in args.legs.split(",") if x.strip()]
    state0 = state  # all legs start here

    # ---- leg: metropolis ---------------------------------------------------
    if "metropolis" in legs:
        st = state0
        origin = np.zeros(2, np.float32)
        snaps = [corrected(st, origin)]
        moves = 0
        # warm the chunk fn (already compiled from equilibration)
        t0 = time.perf_counter()
        for i in range(args.snapshots - 1):
            st, m = metro_chunk(st, args.chunk_sweeps)
            moves += int(sync(m.proposed))
            origin = np.asarray(replay_origin(
                cfg, st.key, int(st.sweep) - args.chunk_sweeps,
                args.chunk_sweeps, origin=jnp.asarray(origin)))
            snaps.append(corrected(st, origin))
        wall = time.perf_counter() - t0
        f = f_of_lag(np.stack(snaps))
        tau = tau_from_f(f)
        chunk_wall = wall / (args.snapshots - 1)
        results["metropolis"] = {
            "leg": "metropolis", "wall_s": wall,
            "chunk_unit": f"{args.chunk_sweeps} sweeps",
            "chunk_wall_s": chunk_wall,
            "rate_per_s": moves / wall, "rate_unit": "trial moves/s",
            "tau_chunks": tau, "tau_wall_s": tau * chunk_wall,
            "decorr_per_s": (1.0 / (tau * chunk_wall)
                             if math.isfinite(tau) else 0.0),
            "f_curve": [round(float(x), 4) for x in f],
        }
        print(json.dumps(results["metropolis"]), flush=True)

    # ---- leg: serial ECMC --------------------------------------------------
    if "ecmc" in legs:
        from mcjax.ops.ecmc import run_ecmc
        ell = args.ell_frac * box
        st = state0
        key = jax.random.key(101)
        snaps = [corrected(st, np.zeros(2, np.float32))]
        ev = le = disp = 0.0
        # warmup compile (excluded from timing): one chunk, then restart
        st_w, m_w = run_ecmc(cfg, pot, st, key, args.chains_per_chunk, ell)
        sync(m_w.events)
        t0 = time.perf_counter()
        st = state0
        capped = 0
        for i in range(args.snapshots - 1):
            st, m = run_ecmc(cfg, pot, st, jax.random.fold_in(key, i),
                             args.chains_per_chunk, ell)
            ev += sync(m.events)
            le += sync(m.lifts)
            disp += sync(m.total_length)
            capped += int(sync(m.capped))
            snaps.append(corrected(st, np.zeros(2, np.float32)))
        wall = time.perf_counter() - t0
        f = f_of_lag(np.stack(snaps))
        tau = tau_from_f(f)
        chunk_wall = wall / (args.snapshots - 1)
        results["ecmc"] = {
            "leg": "ecmc", "wall_s": wall,
            "chunk_unit": f"{args.chains_per_chunk} chains x ell={ell:.0f}",
            "chunk_wall_s": chunk_wall,
            "rate_per_s": ev / wall, "rate_unit": "events/s",
            "lifts_per_s": le / wall, "displacement_per_s": disp / wall,
            "capped": capped,
            "tau_chunks": tau, "tau_wall_s": tau * chunk_wall,
            "decorr_per_s": (1.0 / (tau * chunk_wall)
                             if math.isfinite(tau) else 0.0),
            "f_curve": [round(float(x), 4) for x in f],
        }
        print(json.dumps(results["ecmc"]), flush=True)

    # ---- leg: strip-parallel ECMC -----------------------------------------
    if "strips" in legs:
        from mcjax.ops.ecmc import run_ecmc_parallel
        n_strips = args.strips
        if n_strips <= 0:
            n_strips = max(2, cps // 8)
            while cps % n_strips:
                n_strips -= 1
        G = cps // n_strips
        ell_s = 0.8 * (G - 1) * cfg.cell_width
        st = state0
        key = jax.random.key(202)
        snaps = [corrected(st, np.zeros(2, np.float32))]
        ev = le = disp = refl = 0.0
        st_w, m_w = run_ecmc_parallel(cfg, pot, st, key,
                                      args.rounds_per_chunk, ell_s, n_strips)
        sync(m_w.events)
        t0 = time.perf_counter()
        st = state0
        capped = 0
        for i in range(args.snapshots - 1):
            st, m = run_ecmc_parallel(cfg, pot, st,
                                      jax.random.fold_in(key, i),
                                      args.rounds_per_chunk, ell_s, n_strips)
            ev += sync(m.events)
            le += sync(m.lifts)
            disp += sync(m.total_length)
            refl += sync(m.reflections)
            capped += int(sync(m.capped))
            snaps.append(corrected(st, np.zeros(2, np.float32)))
        wall = time.perf_counter() - t0
        f = f_of_lag(np.stack(snaps))
        tau = tau_from_f(f)
        chunk_wall = wall / (args.snapshots - 1)
        results["strips"] = {
            "leg": "strips", "wall_s": wall,
            "chunk_unit": (f"{args.rounds_per_chunk} rounds x {n_strips} "
                           f"strips x ell={ell_s:.0f}"),
            "chunk_wall_s": chunk_wall,
            "rate_per_s": ev / wall, "rate_unit": "lockstep events/s",
            "lifts_per_s": le / wall, "displacement_per_s": disp / wall,
            "reflections_per_s": refl / wall, "capped": capped,
            "tau_chunks": tau, "tau_wall_s": tau * chunk_wall,
            "decorr_per_s": (1.0 / (tau * chunk_wall)
                             if math.isfinite(tau) else 0.0),
            "f_curve": [round(float(x), 4) for x in f],
        }
        print(json.dumps(results["strips"]), flush=True)

    # ---- summary -----------------------------------------------------------
    print("\n## decorrelation per wall-second (F(k*, t) 1/e rate)")
    base = results.get("metropolis", {}).get("decorr_per_s", 0.0)
    for name, r in results.items():
        rel = (f" = {r['decorr_per_s'] / base:.2f}x metropolis"
               if base > 0 and name != "metropolis" else "")
        tau_s = r["tau_wall_s"]
        tau_txt = f"{tau_s:.2f}s" if math.isfinite(tau_s) else ">budget"
        print(f"## {name:>10}: tau_1/e {tau_txt}, "
              f"{r['rate_per_s']:.3e} {r['rate_unit']}{rel}")
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump({"n": n, "phi": phi, "k_star": k_star,
                       "legs": results}, fh, indent=1)
        print(f"## wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
