"""Multi-process launcher / dryrun: ``python -m mcjax.launch --processes 2``.

Removes the reference's single-process ceiling (its host-mediated
``d_Eblocks`` reduction, kernel.cu:672-677, is the closest thing it has to a
communication backend). The launcher starts N localhost processes, each
contributing ``--devices-per-process`` virtual CPU devices; every process
runs the SAME single-controller program: build a global mesh spanning all
processes (mcjax.parallel.multihost.spatial_mesh), shard the cell grid over
it, and run the sharded checkerboard sweep — halo exchange crosses the
process boundary through the distributed runtime exactly as it would cross
DCN between pod slices.

Exit code 0 means every process finished with particle conservation and
live acceptance — the multi-host analogue of __graft_entry__.dryrun_multichip.

On a real pod there is no parent: run one process per host with
``--child --process-id $i --processes $N --coordinator host0:port`` (or let
the env vars / cluster auto-detection fill them in).
"""

from __future__ import annotations

import argparse
import math
import os
import subprocess
import sys


def _hd_config(args, ndev, seed=0, min_width=1.0, nmax=12):
    from mcjax.core.config import SimConfig

    n, phi = args.n_atoms, args.phi
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // min_width)
    # half_cps divisible by every mesh axis (global device count is a
    # power of two here: factors are too)
    cps -= cps % (2 * ndev)
    if cps < 4:
        raise ValueError("config too small for the global mesh; raise "
                         "--n-atoms")
    return SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                     nmax=nmax, n_moves=4, proposal="uniform",
                     step_size=0.15, beta=1.0, seed=seed)


def _leg_sweep(args, mesh, engine: str) -> str:
    """Sharded checkerboard sweep leg (XLA or interpret-Pallas kernel):
    conservation + live acceptance across the process boundary."""
    import jax
    import jax.numpy as jnp

    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere
    from mcjax.parallel import mesh as pmesh, multihost

    cfg = _hd_config(args, jax.device_count())
    pot = HardSphere(1.0)
    st = multihost.make_global_state(cfg, init_state(cfg), mesh, ("y", "x"))
    run = pmesh.make_sharded_run_sweeps(
        cfg, pot, mesh, ("y", "x"), args.sweeps, engine=engine,
        interpret=(engine == "pallas"),
        check_vma=(engine != "pallas"))
    st2, met = run(st)
    total = int(jax.jit(lambda x: jnp.sum(x))(st2.occ))
    accepted = int(jnp.sum(met.accepted))
    assert total == cfg.n_atoms, f"conservation violated: {total}"
    assert accepted > 0, "no accepted moves"
    return f"{engine}: atoms {total}, accepted {accepted}"


def _leg_npt(args, mesh) -> str:
    """Sharded NPT (constant-pressure) leg: the carried anchored energy and
    the replicated volume decision must agree across processes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcjax.core.state import init_state
    from mcjax.models.potentials import LennardJones
    from mcjax.ops.npt import NPTState
    from mcjax.parallel import multihost
    from mcjax.parallel.mesh import state_sharding
    from mcjax.parallel.npt import make_sharded_run_npt
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = _hd_config(args, jax.device_count(), seed=1, min_width=2.0,
                     nmax=20)
    cfg = __import__("dataclasses").replace(
        cfg, proposal="gaussian", step_size=0.1, beta=1.0)
    pot = LennardJones(r_cut=2.0)
    cfg.validate_against(pot.r_cut)
    sim = multihost.make_global_state(cfg, init_state(cfg), mesh,
                                      ("y", "x"))
    ls = multihost.put_global(np.zeros((), np.float32),
                              NamedSharding(mesh, P()))
    nst = NPTState(sim=sim, log_scale=ls)
    run = make_sharded_run_npt(cfg, pot, mesh, ("y", "x"), pressure=1.0,
                               n_sweeps=args.sweeps)
    nst2, ms = run(nst)
    total = int(jax.jit(lambda x: jnp.sum(x))(nst2.sim.occ))
    assert total == cfg.n_atoms, f"NPT conservation violated: {total}"
    e_last = float(np.asarray(ms.energy)[-1])
    assert np.isfinite(e_last), "NPT carried energy not finite"
    scale = float(jnp.exp(nst2.log_scale))
    assert 0.5 < scale < 2.0, f"NPT scale ran away: {scale}"
    return f"npt: atoms {total}, scale {scale:.4f}, E {e_last:.2f}"


def _leg_mixture(args, mesh) -> str:
    """Sharded binary-mixture leg (species plane rides the halo exchange):
    per-species conservation across the process boundary."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mcjax.models.mixtures import kob_andersen
    from mcjax.ops.cells import stratified_positions
    from mcjax.ops.mixture import init_mixture_state
    from mcjax.parallel import mesh as pmesh, multihost

    cfg = _hd_config(args, jax.device_count(), seed=2, min_width=2.5,
                     nmax=20)
    cfg = __import__("dataclasses").replace(
        cfg, proposal="gaussian", step_size=0.1, beta=1.0 / 2.0)
    ka = kob_andersen()  # the mixture is dimension-agnostic (pairwise LJ)
    cfg.validate_against(ka.r_cut)
    spec = (np.arange(cfg.n_atoms) % 5 == 4).astype(np.int32)
    st_host = init_mixture_state(cfg, stratified_positions(cfg),
                                 jnp.asarray(spec))
    st = multihost.make_global_state(cfg, st_host, mesh, ("y", "x"))
    run = pmesh.make_sharded_run_sweeps(cfg, ka, mesh, ("y", "x"),
                                        args.sweeps)
    st2, met = run(st)
    total = int(jax.jit(lambda x: jnp.sum(x))(st2.occ))
    assert total == cfg.n_atoms, f"mixture conservation violated: {total}"
    # per-species counts survive transport through the halo/shift plumbing
    from mcjax.ops.mixture import unbin_mixture
    _, s_out = unbin_mixture(cfg, st2.pos, st2.occ)
    nb = int(np.sum(np.asarray(s_out) == 1))
    assert nb == int(spec.sum()), f"species B count {nb} != {spec.sum()}"
    accepted = int(jnp.sum(met.accepted))
    assert accepted > 0, "no accepted mixture moves"
    return f"mixture: atoms {total}, B {nb}, accepted {accepted}"


def _leg_fused(args) -> str:
    """Sharded FUSED-engine leg (VERDICT r4 item 6): the flagship
    in-kernel-DMA kernel on a 2-shard 1-D mesh whose shards live in
    DIFFERENT processes — the ring-apron halo ppermutes cross the process
    boundary through the distributed runtime.  Gate: bitwise equality
    against the sharded XLA engine on the SAME mesh (identical per-shard
    Threefry streams — the tests/test_mesh_fused.py check, now with the
    halo riding the inter-process transport)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere
    from mcjax.parallel import fused as pfused
    from mcjax.parallel import mesh as pmesh, multihost

    n, phi = 13000, 0.42
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=8, n_moves=2, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=5)
    pot = HardSphere(1.0)

    # one device from each process -> every halo ppermute is inter-process
    devs = jax.devices()
    by_proc = {}
    for d in devs:
        by_proc.setdefault(d.process_index, d)
    picked = [by_proc[p] for p in sorted(by_proc)][:2]
    if len(picked) < 2:
        picked = devs[:2]            # single-process fallback
    mesh = Mesh(np.array(picked).reshape(2), ("x",))

    st0 = init_state(cfg)
    st_f = multihost.make_global_state(cfg, st0, mesh, ("x", None))
    run_f = pfused.make_sharded_run_fused(
        cfg, pot, mesh, "x", args.sweeps, tile_rows=8, interpret=True,
        check_vma=False)
    out_f, m_f = run_f(st_f)

    run_x = pmesh.make_sharded_run_sweeps(
        cfg, pot, mesh, ("x", None), args.sweeps, engine="xla")
    st_x = multihost.make_global_state(cfg, st0, mesh, ("x", None))
    out_x, m_x = run_x(st_x)

    total = int(jax.jit(lambda x: jnp.sum(x))(out_f.occ))
    assert total == cfg.n_atoms, f"fused conservation violated: {total}"
    eq = bool(jax.jit(
        lambda a, b: jnp.array_equal(a, b))(out_f.pos, out_x.pos))
    assert eq, "fused-sharded trajectory != xla-sharded (bitwise)"
    acc_f = int(jnp.sum(m_f.accepted))
    acc_x = int(jnp.sum(m_x.accepted))
    assert acc_f == acc_x > 0, (acc_f, acc_x)
    xproc = picked[0].process_index != picked[-1].process_index
    return (f"fused: atoms {total}, accepted {acc_f}, bitwise==xla, "
            f"cross-process={xproc}")


def child_main(args) -> None:
    """One process of the multi-process dryrun (also the pod entrypoint).

    Runs the legs named in --legs on the global cross-process mesh; every
    leg asserts its own invariants (conservation, live acceptance, carried
    energies) so a silent cross-process corruption fails the exit code."""
    import jax

    # This box's sitecustomize force-registers a remote-TPU backend; the
    # dryrun must be CPU-hermetic (same reasoning as dryrun_multichip).
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mcjax.parallel import multihost

    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.processes,
                         process_id=args.process_id,
                         local_device_count=args.devices_per_process)
    print(multihost.process_summary(), flush=True)

    mesh = multihost.spatial_mesh(("y", "x"))
    reports = []
    for leg in args.legs.split(","):
        leg = leg.strip()
        if leg == "xla":
            reports.append(_leg_sweep(args, mesh, "xla"))
        elif leg == "pallas":
            reports.append(_leg_sweep(args, mesh, "pallas"))
        elif leg == "npt":
            reports.append(_leg_npt(args, mesh))
        elif leg == "mixture":
            reports.append(_leg_mixture(args, mesh))
        elif leg == "fused":
            reports.append(_leg_fused(args))
        else:
            raise SystemExit(f"unknown leg {leg!r} "
                             "(known: xla, pallas, npt, mixture, fused)")
    print(f"process {jax.process_index()}: ok ({'; '.join(reports)})",
          flush=True)
    jax.distributed.shutdown()


def parent_main(args) -> int:
    """Spawn N localhost children and aggregate their exit codes."""
    from mcjax.parallel.multihost import coordinator_on_localhost

    coord = args.coordinator or coordinator_on_localhost(args.port)
    procs = []
    for i in range(args.processes):
        cmd = [sys.executable, "-m", "mcjax.launch", "--child",
               "--process-id", str(i),
               "--processes", str(args.processes),
               "--devices-per-process", str(args.devices_per_process),
               "--coordinator", coord,
               "--sweeps", str(args.sweeps),
               "--legs", args.legs,
               "--n-atoms", str(args.n_atoms),
               "--phi", str(args.phi)]
        procs.append(subprocess.Popen(cmd, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
    rc = 0
    try:
        for p in procs:
            try:
                rc |= p.wait(timeout=args.timeout)
            except subprocess.TimeoutExpired:
                rc |= 1
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    print("launch: " + ("ok" if rc == 0 else "FAILED"), flush=True)
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--legs", default="xla",
                    help="comma list of workload legs each process runs on "
                         "the global mesh: xla, pallas (interpret kernel), "
                         "npt, mixture, fused (flagship halo across the "
                         "process boundary, bitwise vs sharded XLA)")
    ap.add_argument("--n-atoms", type=int, default=1024)
    ap.add_argument("--phi", type=float, default=0.4)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (default: localhost)")
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--no-cpu", dest="cpu", action="store_false",
                    help="don't force the CPU backend (real pods)")
    args = ap.parse_args(argv)
    if args.child:
        child_main(args)
        return 0
    return parent_main(args)


if __name__ == "__main__":
    sys.exit(main())
