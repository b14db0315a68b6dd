#!/usr/bin/env python
"""Headline benchmark: MC trial moves/sec/chip, hard disks (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published 57 s for 1000 sweeps x 1280 moves of the
3D LJ system (pptx slide 14) = 2.25e4 trial moves/s on its GPU.
"""

import argparse
import json
import math
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

REFERENCE_MOVES_PER_S = 2.25e4  # BASELINE.md


def build(n_atoms: int, phi: float, cell_width_factor: float, nmax: int,
          n_moves: int, seed: int = 0):
    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere

    diameter = 1.0
    box = math.sqrt(n_atoms * math.pi * diameter**2 / 4.0 / phi)
    cps = int(box // (diameter * cell_width_factor))
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n_atoms, box_length=box,
                    cells_per_side=cps, nmax=nmax, n_moves=n_moves,
                    proposal="uniform", step_size=0.18, beta=1.0, seed=seed)
    pot = HardSphere(diameter)
    cfg.validate_against(pot.r_cut)
    state = init_state(cfg)
    return cfg, pot, state


def run_rng_gate(ih_k: int, engine: str = "fused") -> str:
    """Quick in-process statistical gate for the in-kernel hardware PRNG
    (acceptance z-test + dE-anchor + EOS parity vs the host-Threefry path,
    scripts/validate_in_kernel_rng.run_gate) so every BENCH_r*.json records
    an rng_gate verdict for the defaults it benchmarked (VERDICT r3 #4b).
    ``engine`` must be the kernel path that produced the headline number
    (VERDICT r4 item 4a: certifying the fused engine while benchmarking the
    ring engine overstates what was validated).
    Returns "pass" / "fail" / "error:<msg>"."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    try:
        from validate_in_kernel_rng import run_gate
        res = run_gate(ih_k=ih_k, quick=True, quiet=True, engine=engine)
        print(f"# rng_gate: {'pass' if res['ok'] else 'fail'} "
              f"(ih_k={res['ih_k']}, engine={res['engine']}, "
              f"{res['checks']} checks, failures={res['failures']})",
              file=sys.stderr)
        return "pass" if res["ok"] else "fail"
    except Exception as e:  # never let the gate take down the benchmark
        print(f"# rng_gate errored: {e!r}", file=sys.stderr)
        return f"error:{type(e).__name__}"


def bench_reference_lj(engine: str, sweeps: int) -> dict:
    """The reference's own published benchmark workload: ~1k-atom 3D LJ NVT,
    1000 sweeps (pptx slide 14: 57 s on its GPU). Prints one JSON line with
    the wall-time speedup."""
    import jax.numpy as jnp

    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import LennardJones

    cfg = SimConfig(dim=3, n_atoms=800, box_length=10.0, cells_per_side=4,
                    nmax=30, n_moves=15, proposal="gaussian", step_size=0.5,
                    beta=0.3, seed=0)
    pot = LennardJones(r_cut=2.5)
    state = init_state(cfg)
    if engine == "pallas":
        from mcjax.ops.pallas_sweep import run_sweeps_pallas

        def runner(cfg, pot, state, sweeps):
            return run_sweeps_pallas(cfg, pot, state, sweeps, args.tile_rows,
                                     128, False, args.pallas_shift,
                                     args.neighbor_unroll, args.slot_group,
                                     args.in_kernel_rng, args.fused)
    else:
        from mcjax.ops.sweep import run_sweeps as runner
    st, m = runner(cfg, pot, state, sweeps)
    _ = float(jnp.sum(m.delta_e))
    t0 = time.perf_counter()
    st, m = runner(cfg, pot, st, sweeps)
    _ = float(jnp.sum(m.delta_e))
    dt = time.perf_counter() - t0
    # scale to the reference's 1000-sweep run
    wall_1000 = dt * (1000 / sweeps)
    print(f"# {sweeps} sweeps in {dt:.3f}s; "
          f"{int(jnp.sum(m.proposed)) / dt:.3e} moves/s", file=sys.stderr)
    return {
        "metric": "reference LJ workload wall time, 1000 sweeps (ref: 57 s)",
        "value": wall_1000,
        "unit": "s",
        "vs_baseline": 57.0 / wall_1000,
    }


def sharded_pallas_check() -> None:
    """Compile + run the sharded Pallas path on a REAL 1-device TPU mesh
    (interpret=False, check_vma=True) and assert bitwise parity with the
    single-chip Pallas engine — interpret-mode-only coverage would leave the
    flagship multi-chip configuration unproven at the Mosaic level
    (VERDICT r1 Weak #3)."""
    import numpy as np
    from jax.sharding import Mesh

    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere
    from mcjax.ops.pallas_sweep import make_pallas_substep
    from mcjax.ops.sweep import mc_sweep
    from mcjax.parallel import mesh as pmesh

    n, phi, sweeps = 4096, 0.45, 5
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    from mcjax.core.config import SimConfig
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=4, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=3)
    pot = HardSphere(1.0)
    st = init_state(cfg)

    m = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    run = pmesh.make_sharded_run_sweeps(cfg, pot, m, ("y", "x"), sweeps,
                                        engine="pallas", interpret=False,
                                        check_vma=True)
    st_sh = pmesh.shard_state(cfg, st, m, ("y", "x"))
    out, ms = run(st_sh)

    # single-chip reference with the same RNG view a (0,0) shard sees
    substep = make_pallas_substep(vma=None)
    zoff = jnp.zeros((2,), jnp.int32)

    def body(s, _):
        s, mm = mc_sweep(cfg, pot, s, block_offset=zoff,
                         shard_id=jnp.int32(0), substep_fn=substep)
        return s, mm

    ref, _ = jax.jit(lambda s: jax.lax.scan(body, s, length=sweeps))(st)

    assert int(jnp.sum(out.occ)) == n, "sharded run lost particles"
    np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(ref.pos))
    np.testing.assert_array_equal(np.asarray(out.occ), np.asarray(ref.occ))
    print("# sharded pallas check: compiled 1-device TPU mesh, "
          "bitwise == single-chip", file=sys.stderr)


def sharded_fused_check(in_kernel_rng: bool = True) -> None:
    """Compile + run the SHARDED FUSED engine (in-kernel DMA + hardware
    PRNG) on a REAL 1-device TPU mesh (interpret=False, check_vma=True) and
    assert bitwise parity with the single-chip fused loop run with
    shard_fold=0 — the flagship multi-chip configuration proven at the
    Mosaic level (VERDICT r3 item 2; the in-kernel RNG seeds are a
    deterministic function of the folded substep key + tile id, so parity
    holds for the hardware-PRNG path too)."""
    import numpy as np
    from jax.sharding import Mesh

    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere
    from mcjax.ops.pallas_sweep import run_sweeps_fused
    from mcjax.parallel import fused as pfused

    n, phi, sweeps = 16384, 0.45, 5
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=4, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=3)
    pot = HardSphere(1.0)
    st = init_state(cfg)

    m = Mesh(np.array(jax.devices()[:1]).reshape(1), ("x",))
    run = pfused.make_sharded_run_fused(
        cfg, pot, m, "x", sweeps, tile_rows=8,
        in_kernel_rng=in_kernel_rng, check_vma=True)
    out, ms = run(pfused.shard_state_fused(cfg, st, m, "x"))

    ref, _ = jax.jit(lambda s: run_sweeps_fused(
        cfg, pot, s, sweeps, 8, 128, False, 1, 8, in_kernel_rng, 0, 0))(st)

    assert int(jnp.sum(out.occ)) == n, "sharded fused run lost particles"
    np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(ref.pos))
    np.testing.assert_array_equal(np.asarray(out.occ), np.asarray(ref.occ))
    print("# sharded FUSED check: compiled 1-device TPU mesh "
          f"(in_kernel_rng={in_kernel_rng}), bitwise == single-chip",
          file=sys.stderr)


def _small_hd(n: int = 16384, phi: float = 0.45, seed: int = 3):
    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere

    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=4, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=seed)
    return cfg, HardSphere(1.0), init_state(cfg)


def ring_fused_bitwise_check(in_kernel_rng: bool = True) -> None:
    """One-shot TPU probe: the RING engine's trajectories are BITWISE equal
    to the fused engine's under the in-kernel hardware PRNG — the claim at
    ops/pallas_ring.py's docstring, previously evidenced on hardware only
    for host RNG (VERDICT r4 item 4b).  Both engines seed the kernel PRNG
    from the same (substep key, tile id) and tile rows identically, so the
    streams coincide; this check turns that argument into a measured fact
    recorded in every bench run's stderr."""
    import numpy as np

    from mcjax.ops.pallas_ring import run_sweeps_ring
    from mcjax.ops.pallas_sweep import run_sweeps_fused

    cfg, pot, st = _small_hd()
    sweeps, tr = 5, 8
    st_r, _ = run_sweeps_ring(cfg, pot, st, sweeps, tr, 128, False, 1, 8,
                              in_kernel_rng, 0, None, True, False)
    st_f, _ = jax.jit(lambda s: run_sweeps_fused(
        cfg, pot, s, sweeps, tr, 128, False, 1, 8, in_kernel_rng, 0))(st)
    assert int(jnp.sum(st_r.occ)) == cfg.n_atoms, "ring run lost particles"
    np.testing.assert_array_equal(np.asarray(st_r.pos), np.asarray(st_f.pos))
    np.testing.assert_array_equal(np.asarray(st_r.occ), np.asarray(st_f.occ))
    print("# ring==fused bitwise check: compiled TPU, "
          f"in_kernel_rng={in_kernel_rng}, trajectories identical",
          file=sys.stderr)


def onecall_bitwise_check(in_kernel_rng: bool = True) -> None:
    """One-shot compiled-TPU probe: the single-call sweep (all color
    sub-steps in ONE pallas_call, ring_sweep_onecall) is BITWISE the 4-call
    ring engine in both RNG modes.  This is the gate that MUST run on
    hardware: the one-call kernel reads earlier sub-steps' writes through
    the aliased ring buffer, and interpret mode emulates the alias with
    separate buffers (reads through the input ref see stale data — the
    round-5 near-miss found by the CPU bitwise gates), so only the real
    donated-buffer semantics prove the production path."""
    import numpy as np

    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere
    from mcjax.ops.pallas_ring import run_sweeps_ring

    # cps=64 / tile_rows=8 satisfies the mirror geometry (padded == P)
    cfg = SimConfig(dim=2, n_atoms=4000, box_length=128.0, cells_per_side=64,
                    nmax=10, n_moves=4, proposal="uniform", step_size=0.25,
                    beta=1.0, seed=7)
    pot = HardSphere(1.0)
    st = init_state(cfg)
    sweeps, tr = 5, 8
    st_4, m_4 = run_sweeps_ring(cfg, pot, st, sweeps, tr, 128, False, 1, 8,
                                in_kernel_rng, 0, None, True, False, False)
    st_1, m_1 = run_sweeps_ring(cfg, pot, st, sweeps, tr, 128, False, 1, 8,
                                in_kernel_rng, 0, None, True, False, True)
    assert int(jnp.sum(st_1.occ)) == cfg.n_atoms, "one-call lost particles"
    np.testing.assert_array_equal(np.asarray(st_4.pos), np.asarray(st_1.pos))
    np.testing.assert_array_equal(np.asarray(st_4.occ), np.asarray(st_1.occ))
    np.testing.assert_array_equal(np.asarray(m_4.accepted),
                                  np.asarray(m_1.accepted))
    print("# one-call sweep check: compiled TPU, "
          f"in_kernel_rng={in_kernel_rng}, bitwise == 4-call ring",
          file=sys.stderr)


def sharded_ring_check(in_kernel_rng: bool = True) -> None:
    """Compile + run the SHARDED RING engine (the 2D flagship under the
    mesh, parallel/ring.py) on a REAL 1-device TPU mesh (interpret=False,
    check_vma=True) and assert bitwise parity with the single-chip ring
    loop run with shard_fold=0 — the engine the 2D headline actually ships
    proven at the Mosaic level (VERDICT r4 item 2)."""
    import numpy as np
    from jax.sharding import Mesh

    from mcjax.ops.pallas_ring import run_sweeps_ring
    from mcjax.parallel import ring as pring

    cfg, pot, st = _small_hd()
    sweeps, tr = 5, 8
    m = Mesh(np.array(jax.devices()[:1]).reshape(1), ("x",))
    run = pring.make_sharded_run_ring(
        cfg, pot, m, "x", sweeps, tile_rows=tr,
        in_kernel_rng=in_kernel_rng, check_vma=True)
    out, _ = run(pring.shard_state_ring(cfg, st, m, "x"))

    ref, _ = run_sweeps_ring(cfg, pot, st, sweeps, tr, 128, False, 1, 8,
                             in_kernel_rng, 0, 0, False, False)
    assert int(jnp.sum(out.occ)) == cfg.n_atoms, "sharded ring lost particles"
    np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(ref.pos))
    np.testing.assert_array_equal(np.asarray(out.occ), np.asarray(ref.occ))
    print("# sharded RING check: compiled 1-device TPU mesh "
          f"(in_kernel_rng={in_kernel_rng}), bitwise == single-chip",
          file=sys.stderr)


def bench_lj3d(n_atoms: int, sweeps: int, n_moves: int, nmax: int,
               tile_rows: int, neighbor_unroll: int,
               pallas_shift: bool = False, slot_group: int = 8,
               in_kernel_rng: bool = False, fused: bool = False,
               ih_k: int = 0, frozen_cache: bool = False,
               ring: bool = False) -> dict:
    """3D Lennard-Jones at the reference's own density (rho = 0.8,
    kernel.cu:17-29: 800 atoms in a 10^3 box) scaled to production N —
    the reference's physics, not just the 2D hard-disk headline
    (VERDICT r1 Missing #3)."""
    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import LennardJones
    from mcjax.ops.pallas_sweep import run_sweeps_pallas

    rho = 0.8
    box = (n_atoms / rho) ** (1.0 / 3.0)
    cps = int(box // 2.5)
    cps -= cps % 2
    cfg = SimConfig(dim=3, n_atoms=n_atoms, box_length=box,
                    cells_per_side=cps, nmax=nmax, n_moves=n_moves,
                    proposal="gaussian", step_size=0.12, beta=0.3, seed=0)
    pot = LennardJones(r_cut=2.5)
    cfg.validate_against(pot.r_cut)
    # Stratified init bounds t=0 occupancy at ceil(N/cells) (the cubic
    # lattice aliases against the cell grid, peaking ~2x the equilibrium
    # mean), so nmax can be sized for the fluid, not the transient.
    from mcjax.ops.cells import stratified_positions
    state = init_state(cfg, positions=stratified_positions(cfg))

    if ring:
        from mcjax.ops.pallas_ring import run_sweeps_ring

        def _run(st0, n):
            return run_sweeps_ring(cfg, pot, st0, n, tile_rows, 128, False,
                                   neighbor_unroll, slot_group,
                                   in_kernel_rng, ih_k, None, True,
                                   frozen_cache)
    else:
        def _run(st0, n):
            return run_sweeps_pallas(cfg, pot, st0, n, tile_rows, 128,
                                     False, pallas_shift, neighbor_unroll,
                                     slot_group, in_kernel_rng, fused, ih_k,
                                     frozen_cache)
    st, m = _run(state, sweeps)
    _ = float(jnp.sum(m.delta_e)) + float(jnp.max(st.pos))
    t0 = time.perf_counter()
    st2, m = _run(st, sweeps)
    _ = float(jnp.sum(m.delta_e)) + float(jnp.max(st2.pos))
    dt = time.perf_counter() - t0

    import numpy as np
    proposed = int(np.sum(np.asarray(m.proposed, np.int64)))
    accepted = int(np.sum(np.asarray(m.accepted, np.int64)))
    moves_per_s = proposed / dt
    print(f"# {sweeps} sweeps in {dt:.3f}s; acceptance "
          f"{accepted / max(proposed, 1):.3f}; atoms {int(st2.occ.sum())}; "
          f"overflow {bool(st2.overflow)}; cps {cps}; nmax {nmax}; "
          f"tile_rows {tile_rows}; unroll {neighbor_unroll}; ih_k {ih_k}",
          file=sys.stderr)
    return {
        "metric": "3D LJ MC trial moves/sec/chip (N=%d, rho=0.8, pallas)"
                  % cfg.n_atoms,
        "value": moves_per_s,
        "unit": "moves/s",
        "vs_baseline": moves_per_s / REFERENCE_MOVES_PER_S,
    }


def bench_ka3d(n_atoms: int, sweeps: int, n_moves: int, nmax: int,
               tile_rows: int, slot_group: int = 4,
               fused: bool = False, in_kernel_rng: bool = False,
               neighbor_unroll: int = 2, ih_k: int = 0,
               frozen_cache: bool = False) -> dict:
    """Kob-Andersen 80:20 binary LJ mixture at rho=1.2, T=0.8 (the canonical
    glass former) at production N on the Pallas mixture kernel — per-pair
    (eps, sigma, r_cut) resolved in-kernel from the species plane. The
    reference has no mixtures at all."""
    from mcjax.core.config import SimConfig
    from mcjax.models.mixtures import kob_andersen
    from mcjax.ops.cells import stratified_positions
    from mcjax.ops.mixture import init_mixture_state
    from mcjax.ops.pallas_sweep import run_sweeps_pallas

    ka = kob_andersen()
    rho = 1.2
    box = (n_atoms / rho) ** (1.0 / 3.0)
    cps = int(box // ka.r_cut)
    cps -= cps % 2
    cfg = SimConfig(dim=3, n_atoms=n_atoms, box_length=box,
                    cells_per_side=cps, nmax=nmax, n_moves=n_moves,
                    proposal="gaussian", step_size=0.09, beta=1.0 / 0.8,
                    seed=0)
    cfg.validate_against(ka.r_cut)
    spec = (jnp.arange(n_atoms) % 5 == 4).astype(jnp.int32)
    state = init_mixture_state(cfg, stratified_positions(cfg), spec)

    # BOTH calls must share every static argument (frozen_cache included):
    # round 4's "ka3d frozen-cache regresses 450x" was exactly this bug —
    # the warmup compiled the cached kernel but the timed call omitted
    # frozen_cache, so the timed region recompiled the UNcached kernel
    # through the remote compiler (~3 min, i.e. the whole "regression").
    def _run(st0):
        return run_sweeps_pallas(cfg, ka, st0, sweeps, tile_rows, 128,
                                 False, False, neighbor_unroll, slot_group,
                                 in_kernel_rng, fused, ih_k, frozen_cache)

    st, m = _run(state)
    _ = float(jnp.sum(m.delta_e)) + float(jnp.max(st.pos))
    t0 = time.perf_counter()
    st2, m = _run(st)
    _ = float(jnp.sum(m.delta_e)) + float(jnp.max(st2.pos))
    dt = time.perf_counter() - t0

    import numpy as np
    proposed = int(np.sum(np.asarray(m.proposed, np.int64)))
    accepted = int(np.sum(np.asarray(m.accepted, np.int64)))
    moves_per_s = proposed / dt
    print(f"# {sweeps} sweeps in {dt:.3f}s; acceptance "
          f"{accepted / max(proposed, 1):.3f}; atoms {int(st2.occ.sum())}; "
          f"overflow {bool(st2.overflow)}; cps {cps}; nmax {nmax}; "
          f"tile_rows {tile_rows}; ih_k {ih_k}", file=sys.stderr)
    return {
        "metric": "Kob-Andersen 80:20 mixture trial moves/sec/chip "
                  "(N=%d, rho=1.2, T=0.8, pallas)" % cfg.n_atoms,
        "value": moves_per_s,
        "unit": "moves/s",
        "vs_baseline": moves_per_s / REFERENCE_MOVES_PER_S,
    }


def bench_ecmc(n_atoms: int, replicas: int, chains: int,
               phi: float = 0.5) -> dict:
    """Replica-vmapped event-chain MC on hard disks: R independent systems
    run whole chain schedules in lockstep, each event a masked 3^dim-ring
    sweep (mcjax.ops.ecmc). Metric: lift events/s/chip — every lift is an
    accepted collision-to-collision particle displacement, the
    rejection-free analogue of an accepted trial move (the reference has no
    rejection-free moves at all)."""
    from mcjax.core.config import SimConfig
    from mcjax.models.potentials import HardSphere
    from mcjax.ops.cells import stratified_positions
    from mcjax.ops.ecmc import pressure_from_metrics, run_ecmc_ensemble
    from mcjax.parallel import ensemble

    box = math.sqrt(n_atoms * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n_atoms, box_length=box,
                    cells_per_side=cps, nmax=8, n_moves=1,
                    proposal="uniform", step_size=0.15, beta=1.0, seed=0)
    pot = HardSphere(1.0)
    states = ensemble.init_ensemble(
        cfg, replicas, positions=stratified_positions(cfg,
                                                      min_separation=1.0))
    ell = float(cfg.box_length / 2.0)

    states, m = run_ecmc_ensemble(cfg, pot, states, jax.random.key(1),
                                  chains, ell)          # warmup + anneal
    _ = float(jnp.sum(m.excess)) + float(jnp.max(states.pos))
    t0 = time.perf_counter()
    states, m = run_ecmc_ensemble(cfg, pot, states, jax.random.key(2),
                                  chains, ell)
    _ = float(jnp.sum(m.excess)) + float(jnp.max(states.pos))
    dt = time.perf_counter() - t0

    import numpy as np
    lifts = int(np.sum(np.asarray(m.lifts, np.int64)))
    events = int(np.sum(np.asarray(m.events, np.int64)))
    z = float(pressure_from_metrics(m))
    print(f"# {replicas}x{chains} chains (ell={ell:.1f}) in {dt:.3f}s; "
          f"{events} events; Z estimate {z:.4f}; capped "
          f"{int(np.sum(np.asarray(m.capped)))}", file=sys.stderr)
    return {
        "metric": "ECMC lift events/s/chip (%d replicas x %d hard disks, "
                  "phi=%.2f)" % (replicas, n_atoms, phi),
        "value": lifts / dt,
        "unit": "lifts/s",
        "vs_baseline": (lifts / dt) / REFERENCE_MOVES_PER_S,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--phi", type=float, default=0.5)
    ap.add_argument("--wfac", type=float, default=2.0)
    ap.add_argument("--nmax", type=int, default=None,
                    help="slab capacity (default: 7 for hard-disk — soaked "
                         "1k sweeps overflow-free at phi=0.5 — and 24 for "
                         "lj3d: the beta=0.3 fluid is hot, equilibrium "
                         "occupancy 13.5 with tails past 20)")
    ap.add_argument("--moves", type=int, default=None,
                    help="trial moves per cell per sub-sweep (default: 64 "
                         "for hard-disk, 60 for lj3d; lj3d at the "
                         "reference-parity point n_M=15 runs ~4.6e7)")
    ap.add_argument("--sweeps", type=int, default=100,
                    help="timed scan length (>=100 keeps the ~30 ms tunnel "
                         "dispatch round-trip below 1% of the measurement)")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--engine", choices=["auto", "xla", "pallas"],
                    default="auto")
    ap.add_argument("--workload", choices=["hard-disk", "reference-lj",
                                           "lj3d", "ka3d", "ecmc"],
                    default="hard-disk")
    ap.add_argument("--replicas", type=int, default=256,
                    help="ecmc workload: vmapped replica count")
    ap.add_argument("--chains", type=int, default=64,
                    help="ecmc workload: event chains per replica per call")
    ap.add_argument("--tile-rows", type=int, default=0)
    ap.add_argument("--neighbor-unroll", type=int, default=None,
                    help="neighbor planes per unrolled kernel step "
                         "(default: measured winners — 2 in 2D, full 26 "
                         "unroll for lj3d/ka3d; r3 cont. tuning log)")
    ap.add_argument("--slot-group", type=int, default=None,
                    help="pair slots per grouped [G, TR, TC] kernel op "
                         "(default: measured winners — 1 for 2D hard-disk, "
                         "2 for lj3d, 4 for ka3d; r3 tuning log)")
    ap.add_argument("--fused", action="store_true", default=None,
                    help="in-kernel halo DMA sub-sweep (no materialized "
                         "neighbor stack; single-chip flat path). Default: "
                         "on everywhere — with the ring-carry scan + full "
                         "neighbor unroll it wins 2D AND 3D (r3 cont.: "
                         "lj3d n_M=15 7.2e7->9.2e7, n_M=60 1.22e8->1.37e8, "
                         "ka3d 5.4e7->6.9e7)")
    ap.add_argument("--no-fused", dest="fused", action="store_false")
    ap.add_argument("--in-kernel-rng", action="store_true", default=None,
                    help="draw randoms from the TPU hardware PRNG inside "
                         "the kernel (drops the 4 Threefry tensor inputs; "
                         "not bitwise vs the XLA engine; gated by "
                         "scripts/validate_in_kernel_rng.py). Default: on "
                         "everywhere (measured winner with --fused)")
    ap.add_argument("--host-rng", dest="in_kernel_rng", action="store_false")
    ap.add_argument("--ring", action="store_true", default=None,
                    help="round-4 in-place ring engine: one aliased "
                         "pallas_call per color sub-step + the ring-native "
                         "Pallas grid shift (ops/pallas_ring.py) — kills "
                         "the ~1.5 ms/sweep XLA glue the loop ablations "
                         "attributed (docs/PERF.md round 4)")
    ap.add_argument("--no-ring", dest="ring", action="store_false")
    ap.add_argument("--one-call", action="store_true", default=None,
                    help="ring engine: run ALL color sub-steps of a sweep "
                         "in ONE pallas_call (grid carries the sub-step "
                         "index; ops/pallas_ring.ring_sweep_onecall). "
                         "Default: on for the 2D ring engine when the "
                         "mirror geometry holds (measured winner, round 5)")
    ap.add_argument("--no-one-call", dest="one_call", action="store_false")
    ap.add_argument("--ring-xla-shift", action="store_true",
                    help="ring engine: use the XLA flat-merge grid shift "
                         "instead of the ring-native Pallas shift kernel")
    ap.add_argument("--pallas-shift", action="store_true",
                    help="use the Pallas grid-shift kernel (wins for 3D "
                         "where the XLA merge runs on lane-hostile tiles)")
    ap.add_argument("--no-sharded-check", action="store_true",
                    help="skip the compiled sharded-Pallas parity check")
    ap.add_argument("--ih-k", type=int, default=None,
                    help="Irwin-Hall uniforms per gaussian component for the "
                         "in-kernel RNG (default pallas_sweep.IH_K=12; any K "
                         "keeps the proposal symmetric, smaller K = fewer "
                         "prng draws, shorter tails)")
    ap.add_argument("--frozen-cache", action="store_true", default=None,
                    help="per-substep frozen-neighbor energy cache: per "
                         "move evaluate only u(new) over the frozen cells "
                         "and subtract the cached old-frozen sum (halves "
                         "the pair work when n_moves >> nmax; bitwise-gated "
                         "on square-well, dE-anchor-gated on LJ — "
                         "tests/test_pallas_frozen.py)")
    ap.add_argument("--no-frozen-cache", dest="frozen_cache",
                    action="store_false")
    ap.add_argument("--inv-newton", type=int, default=None,
                    help="Newton refinements on the kernel's approximate "
                         "reciprocal (potentials.PL_INV_NEWTON; 2 = "
                         "f32-exact default, 1 = rel ~1e-5 on 1/r2 — a "
                         "deterministic potential perturbation inside the "
                         "f32 modelling error, dE-anchor gated)")
    ap.add_argument("--no-rng-gate", action="store_true",
                    help="skip the in-bench quick statistical RNG gate "
                         "(rng_gate field becomes 'skipped')")
    args = ap.parse_args()

    # Measured-winner defaults (docs/PERF.md round 3 + cont.): the fused
    # in-kernel halo DMA + hardware PRNG combination wins everywhere once
    # the ring-carry scan landed — 2D headline 5.2e9 (vs 2.7e9 classic);
    # 3D with full neighbor unroll: lj3d n_M=60 1.37e8 (vs 1.22e8 classic),
    # n_M=15 9.2e7 (vs 7.2e7), ka3d 6.9e7 (vs 5.4e7).
    if args.in_kernel_rng is None:
        args.in_kernel_rng = True
    if args.fused is None:
        args.fused = True
    if args.neighbor_unroll is None:
        args.neighbor_unroll = 26 if args.workload in ("lj3d", "ka3d") else 2
    if args.ih_k is None:
        # 3D gaussian proposals: K=8 passed the full statistical gate
        # (validate_in_kernel_rng.py --ih-k 8, round 4) and is +7% on lj3d
        # n_M=15; 2D stays on the library default (uniform proposals never
        # draw gaussians, so K is moot there)
        args.ih_k = 8 if args.workload in ("lj3d", "ka3d") else 0
    if args.ring is None:
        # round-4 measured winner for the 2D hard-disk workload: the
        # in-place ring engine (one aliased pallas_call per substep + the
        # ring-native Pallas shift): n_M=8 1.96e9 vs 1.42e9 fused, n_M=64
        # headline 6.03e9 vs 5.26e9 (docs/PERF.md round 4).  3D workloads
        # route through bench_lj3d/bench_ka3d (--ring opt-in there).
        args.ring = args.workload == "hard-disk"
    if args.frozen_cache is None:
        # measured round 4: lj3d n_M=60 1.36e8 -> 1.81e8 (+33%).  (The
        # round-4 "ka3d regresses 450x under the cache" claim was a BENCH
        # BUG — the timed call omitted frozen_cache and recompiled inside
        # the timed region; withdrawn in docs/PERF.md's round-4 correction.
        # The corrected ka3d frozen-cache measurement is in the round-5
        # PERF table.)  2D hard disks have no pair energy (flag is a
        # no-op).  The precompute costs ~nmax/n_M of the saved work; the
        # n_M >= 2*nmax heuristic gates lj3d, but ka3d measured the cache
        # a win even at n_M=60 < 2*nmax (7.2e7 vs 6.88e7 at n38, +9% at
        # n32, docs/PERF.md round 5) — the mixture's pair term is pricier
        # than the heuristic's single-species cost model, so ka3d
        # defaults the cache ON unconditionally.
        args.frozen_cache = (args.workload == "ka3d"
                             or (args.workload == "lj3d"
                                 and (args.moves or 60)
                                 >= 2 * (args.nmax or 24)))
    if args.ih_k:
        from mcjax.ops import pallas_sweep as _ps
        _ps.IH_K = args.ih_k  # keep module default consistent (aux paths)
    if args.inv_newton is None:
        # round-5 measured winner for the 3D energetic kernels: dropping
        # the second Newton step is +7% lj3d (1.87e8 -> 2.01e8 at tr8) and
        # +8% ka3d (9.97e7 -> 1.08e8 at nmax=32) — a deterministic rel
        # ~1e-5 potential perturbation inside the f32 modelling error; the
        # in-bench statistical gate runs at the SAME setting (set below,
        # before run_rng_gate), so the shipped config is the gated config.
        # 2D hard disks never evaluate the reciprocal (flag is a no-op).
        args.inv_newton = 1 if args.workload in ("lj3d", "ka3d") else None
    if args.inv_newton is not None:
        from mcjax.models import potentials as _pots
        _pots.PL_INV_NEWTON = args.inv_newton  # trace-time read

    # the gate must exercise the engine that produces the number it
    # certifies (VERDICT r4 item 4a)
    gate_engine = ("ring" if args.ring
                   else ("fused" if args.fused else "classic"))

    def emit(result: dict) -> None:
        if args.no_rng_gate or not args.in_kernel_rng or \
                args.workload in ("reference-lj", "ecmc"):
            result["rng_gate"] = "skipped"
        else:
            result["rng_gate"] = run_rng_gate(args.ih_k, gate_engine)
        print(json.dumps(result))

    if args.workload == "ecmc":
        n = args.n if args.n != 1_048_576 else 4096
        emit(bench_ecmc(n, args.replicas, args.chains, min(args.phi, 0.6)))
        return
    if args.workload == "lj3d":
        n = args.n if args.n != 1_048_576 else 1_000_000
        emit(bench_lj3d(n, min(args.sweeps, 30), args.moves or 60,
                        args.nmax or 24,
                        args.tile_rows or 8, args.neighbor_unroll,
                        args.pallas_shift,
                        args.slot_group or 2, args.in_kernel_rng, args.fused,
                        args.ih_k, bool(args.frozen_cache),
                        bool(args.ring)))
        return
    if args.workload == "ka3d":
        n = args.n if args.n != 1_048_576 else 1_000_000
        # nmax=34 is capacity-honest (1000-sweep soak: max occupancy
        # peaks 30-31, no overflow — scripts/soak_ka3d.py --nmax 34) and
        # sg2 beat sg1/sg4 in the round-5 one-process scan
        # (scripts/scan_ka3d.py; docs/PERF.md round 5).  The 100-sweep
        # cap (vs 30 elsewhere) amortizes the ~30-60 ms tunnel dispatch
        # latency that costs a 0.85 s timed region 3-7%.
        emit(bench_ka3d(n, min(args.sweeps, 100), args.moves or 60,
                        args.nmax or 34, args.tile_rows,
                        args.slot_group or 2,
                        args.fused, args.in_kernel_rng,
                        args.neighbor_unroll, args.ih_k,
                        bool(args.frozen_cache)))
        return
    if args.slot_group is None:
        args.slot_group = 1   # 2D hard-disk: grouping hurts (r3 tuning)
    if args.moves is None:
        args.moves = 64
    if args.nmax is None:
        args.nmax = 7

    if args.workload == "reference-lj":
        eng = args.engine if args.engine != "auto" else "xla"
        emit(bench_reference_lj(eng, min(args.sweeps, 200)))
        return

    cfg, pot, state = build(args.n, args.phi, args.wfac, args.nmax, args.moves)

    engine = args.engine
    if engine == "auto":
        on_tpu = jax.devices()[0].platform != "cpu"
        try:
            from mcjax.ops import pallas_sweep  # noqa: F401
            engine = "pallas" if on_tpu else "xla"
        except Exception:
            engine = "xla"

    if engine == "pallas" and args.ring:
        from mcjax.ops.pallas_ring import _mirror_in_kernel, run_sweeps_ring

        one_call = args.one_call
        if one_call is None:
            # round-5 measured winner when the mirror geometry holds (the
            # production 1M point does); falls back automatically on odd
            # geometries where the single-call sweep cannot mirror aprons
            one_call = _mirror_in_kernel(cfg, args.tile_rows or 32, 128)

        def runner(cfg, pot, state, sweeps):
            return run_sweeps_ring(cfg, pot, state, sweeps,
                                   args.tile_rows or 32, 128, False,
                                   args.neighbor_unroll, args.slot_group,
                                   args.in_kernel_rng, args.ih_k, None,
                                   not args.ring_xla_shift,
                                   bool(args.frozen_cache), one_call)
    elif engine == "pallas":
        from mcjax.ops.pallas_sweep import run_sweeps_pallas

        def runner(cfg, pot, state, sweeps):
            return run_sweeps_pallas(cfg, pot, state, sweeps, args.tile_rows,
                                     128, False, args.pallas_shift,
                                     args.neighbor_unroll, args.slot_group,
                                     args.in_kernel_rng, args.fused,
                                     args.ih_k)
    else:
        from mcjax.ops.sweep import run_sweeps as runner

    # Warmup must use the SAME static sweep count as the timed call (a
    # different scan length is a fresh compile, which would land inside the
    # timed region). Through the remote-TPU tunnel block_until_ready can be a
    # no-op, so force completion by fetching a scalar to host.
    st, m = runner(cfg, pot, state, args.sweeps)
    _ = float(jnp.sum(m.delta_e)) + float(jnp.max(st.pos))

    t0 = time.perf_counter()
    st2, m = runner(cfg, pot, st, args.sweeps)
    _ = float(jnp.sum(m.delta_e)) + float(jnp.max(st2.pos))
    dt = time.perf_counter() - t0

    import numpy as np
    proposed = int(np.sum(np.asarray(m.proposed, np.int64)))  # int32-safe
    accepted = int(np.sum(np.asarray(m.accepted, np.int64)))
    moves_per_s = proposed / dt
    result = {
        "metric": "hard-disk MC trial moves/sec/chip (N=%d, phi=%.2f, %s)"
                  % (cfg.n_atoms, args.phi, engine),
        "value": moves_per_s,
        "unit": "moves/s",
        "vs_baseline": moves_per_s / REFERENCE_MOVES_PER_S,
    }
    if args.no_rng_gate or engine != "pallas" or not args.in_kernel_rng:
        result["rng_gate"] = "skipped"
    else:
        result["rng_gate"] = run_rng_gate(args.ih_k, gate_engine)
    print(json.dumps(result))
    print(f"# {args.sweeps} sweeps in {dt:.3f}s; acceptance "
          f"{accepted / max(proposed, 1):.3f}; atoms {int(st2.occ.sum())}; "
          f"overflow {bool(st2.overflow)}; device {jax.devices()[0].device_kind}",
          file=sys.stderr)

    if engine == "pallas" and not args.no_sharded_check:
        sharded_pallas_check()
        sharded_fused_check(in_kernel_rng=args.in_kernel_rng)
        if args.ring:
            # the engine the headline actually ran: prove it bitwise on
            # hardware, single-chip vs fused AND sharded vs single-chip
            ring_fused_bitwise_check(in_kernel_rng=args.in_kernel_rng)
            sharded_ring_check(in_kernel_rng=args.in_kernel_rng)
            if one_call:
                onecall_bitwise_check(in_kernel_rng=args.in_kernel_rng)


if __name__ == "__main__":
    main()
