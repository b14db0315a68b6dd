"""Statistical gate for the in-kernel (hardware PRNG) Pallas sub-sweep.

The host-Threefry path is the bitwise reference against the XLA engine
(tests/test_pallas.py); the in-kernel PRNG variant draws different
randomness, so it is gated statistically instead — on the real TPU (the
hardware PRNG does not exist in interpret mode):

  1. acceptance-rate parity between RNG modes (z-test on the pooled rate);
  2. dE-anchor drift: the kernel's accumulated delta-E trace must re-anchor
     against an exact cell-list energy recompute (catches any corruption of
     the Metropolis decisions, e.g. a malformed uniform);
  3. hard-disk contact EOS parity (Z from g(d+)) between RNG modes.

Run:  python scripts/validate_in_kernel_rng.py [--ih-k K] [--no-fused]
Exits non-zero on failure; prints one summary line per check, each carrying
the effective (IH_K, fused) configuration actually tested.

``run_gate(...)`` is importable: bench.py calls it with quick=True so every
BENCH_r*.json records an rng_gate verdict from the same process/device that
produced the headline number (VERDICT r3 weak #2b).
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.ops.cells import stratified_positions
from mcjax.ops.pallas_sweep import run_sweeps_pallas
from mcjax.ops.sweep import total_energy_cells


class Gate:
    """Collects named pass/fail checks; prints one line per check."""

    def __init__(self, tag: str, quiet: bool = False):
        self.tag = tag
        self.quiet = quiet
        self.failures: list[str] = []
        self.checks = 0

    def check(self, name, ok, detail):
        self.checks += 1
        if not ok:
            self.failures.append(name)
        if not self.quiet:
            print(f"{'PASS' if ok else 'FAIL'}  {name} [{self.tag}]: {detail}")

    @property
    def ok(self) -> bool:
        return self.checks > 0 and not self.failures


def _acc_rate(m):
    a = int(np.sum(np.asarray(m.accepted, np.int64)))
    p = int(np.sum(np.asarray(m.proposed, np.int64)))
    return a / p, p


def _run(cfg, pot, state, sweeps, in_kernel, engine, ih_k):
    if engine == "ring":
        from mcjax.ops.pallas_ring import run_sweeps_ring
        st, m = run_sweeps_ring(cfg, pot, state, sweeps, 16, 128, False,
                                2, 1, in_kernel, ih_k)
    else:
        st, m = run_sweeps_pallas(cfg, pot, state, sweeps, 16, 128, False,
                                  False, 2, 1, in_kernel,
                                  engine == "fused", ih_k)
    _ = float(jnp.sum(m.delta_e))
    return st, m


def hard_disk_case(g: Gate, engine: str, ih_k: int, quick: bool) -> None:
    n, phi = (65536 if quick else 262144), 0.5
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=7, n_moves=16, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=0)
    pot = HardSphere(1.0)
    st0 = init_state(cfg)
    sweeps = 40 if quick else 60
    st_h, m_h = _run(cfg, pot, st0, sweeps, False, engine, ih_k)
    st_k, m_k = _run(cfg, pot, st0, sweeps, True, engine, ih_k)

    r_h, p_h = _acc_rate(m_h)
    r_k, p_k = _acc_rate(m_k)
    # pooled two-proportion z (samples are correlated within a chain, so
    # use a generous 10x-sigma budget — this catches gross bias, the job)
    pool = (r_h + r_k) / 2
    se = math.sqrt(pool * (1 - pool) * (1 / p_h + 1 / p_k))
    z = abs(r_h - r_k) / se
    g.check("hard-disk acceptance parity", z < 10.0,
            f"host {r_h:.5f} vs in-kernel {r_k:.5f} (z={z:.2f}, "
            f"{p_h:.2e} proposals each)")

    from mcjax.utils.observables import hard_disk_eos_state
    z_h = hard_disk_eos_state(cfg, (st_h.pos, st_h.occ), 1.0)
    z_k = hard_disk_eos_state(cfg, (st_k.pos, st_k.occ), 1.0)
    g.check("hard-disk contact EOS parity", abs(z_h - z_k) / z_h < 0.05,
            f"Z host {z_h:.3f} vs in-kernel {z_k:.3f}")


def lj_case(g: Gate, engine: str, ih_k: int, quick: bool) -> None:
    n, rho = (32768 if quick else 110592), 0.8
    box = (n / rho) ** (1.0 / 3.0)
    cps = int(box // 2.5)
    cps -= cps % 2
    # Size the slab capacity for the ACTUAL cell width: small boxes quantize
    # cps coarsely (quick: n=32768 -> cps=12 -> w=2.87, mean occupancy 19.0),
    # so a fixed nmax=24 OVERFLOWS and the shift-rebin silently drops
    # particles — which drifts the exact energy away from the dE trace and
    # fails the anchor in BOTH RNG modes (round-4 bench regression: the
    # anchor was reporting capacity loss, not kernel error).  1.8x the mean
    # is the production safety ratio (bench lj3d: nmax 24 at mean 13.5).
    nmax = max(24, int(math.ceil(1.8 * n / cps**3)))
    cfg = SimConfig(dim=3, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=nmax, n_moves=10, proposal="gaussian",
                    step_size=0.12, beta=0.3, seed=0)
    pot = LennardJones(r_cut=2.5)
    st0 = init_state(cfg, positions=stratified_positions(cfg))
    e0 = float(total_energy_cells(cfg, pot, st0.pos, st0.occ))
    # NEAR-EQUILIBRIUM comparison: from the stratified start this system's
    # e/atom falls -0.4 -> -3.46 over ~160 sweeps (round-4 probe), so any
    # short-run energy check only measures equilibration SPEED — which
    # legitimately differs between proposal shapes (bounded Irwin-Hall
    # tails vs exact gaussians) and falsely failed K=8.  160 sweeps puts
    # all arms within the +-0.02 run-to-run noise band.
    sweeps = 60 if quick else 160

    st_h, m_h = _run(cfg, pot, st0, sweeps, False, engine, ih_k)
    st_k, m_k = _run(cfg, pot, st0, sweeps, True, engine, ih_k)
    # capacity first: an overflowed run drops particles, which breaks the
    # anchor identity below for reasons that have nothing to do with the RNG
    for tag, st in (("host", st_h), ("in-kernel", st_k)):
        atoms = int(np.asarray(st.occ, np.int64).sum())
        g.check(f"3D LJ capacity ({tag} RNG)",
                not bool(st.overflow) and atoms == n,
                f"overflow={bool(st.overflow)} atoms={atoms}/{n} "
                f"(nmax={cfg.nmax})")
    r_h, _ = _acc_rate(m_h)
    r_k, _ = _acc_rate(m_k)
    g.check("3D LJ acceptance parity", abs(r_h - r_k) < 0.01,
            f"host {r_h:.5f} vs in-kernel {r_k:.5f}")

    # dE-anchor: accumulated trace must meet the exact recompute. This is
    # the check that caught the K>=6 multi-plane prng_random_bits
    # inconsistency (docs/PERF.md round 3) — any malformed draw breaks the
    # telescoped identity at rel ~1e-1; honest f32 accumulation drift over
    # 160 sweeps stays ~1e-4.
    for tag, st, m in (("host", st_h, m_h), ("in-kernel", st_k, m_k)):
        e_tr = e0 + float(np.sum(np.asarray(m.delta_e, np.float64)))
        e_ex = float(total_energy_cells(cfg, pot, st.pos, st.occ))
        rel = abs(e_tr - e_ex) / max(abs(e_ex), 1.0)
        g.check(f"3D LJ dE-anchor ({tag} RNG)", rel < 1e-3,
                f"trace {e_tr:.1f} vs exact {e_ex:.1f} (rel {rel:.2e})")
    # near-equilibrium energies agree between RNG modes (quick runs are
    # still mid-transient — use a transient-sized tolerance there)
    ee_h = float(total_energy_cells(cfg, pot, st_h.pos, st_h.occ)) / n
    ee_k = float(total_energy_cells(cfg, pot, st_k.pos, st_k.occ)) / n
    tol = 0.25 if quick else 0.05
    g.check("3D LJ energy/atom parity", abs(ee_h - ee_k) < tol,
            f"host {ee_h:.4f} vs in-kernel {ee_k:.4f} (tol {tol})")


def run_gate(ih_k: int = 0, fused: bool = True, quick: bool = False,
             quiet: bool = False, engine: str | None = None) -> dict:
    """Run the full statistical gate; returns a JSON-able summary dict.

    ``engine`` selects the kernel path the gate exercises: "classic",
    "fused", or "ring" — pass the engine that produced the number being
    certified (VERDICT r4 item 4a: the 2D headline runs the RING engine,
    so its gate must too).  ``engine=None`` falls back to the legacy
    ``fused`` bool.  ``ih_k=0`` means the library default
    (pallas_sweep.IH_K). ``quick`` shrinks systems/sweeps ~4x for the
    in-bench run (bench.py rng_gate) — the z/anchor thresholds are sized
    for the quick run too.
    """
    from mcjax.ops import pallas_sweep as _ps

    if engine is None:
        engine = "fused" if fused else "classic"
    if engine not in ("classic", "fused", "ring"):
        raise ValueError(f"unknown engine {engine!r}")
    eff_k = ih_k if ih_k else _ps.IH_K
    tag = f"ih_k={eff_k} engine={engine}{' quick' if quick else ''}"
    g = Gate(tag, quiet=quiet)
    hard_disk_case(g, engine, ih_k, quick)
    lj_case(g, engine, ih_k, quick)
    return {"ok": g.ok, "ih_k": eff_k, "engine": engine,
            "fused": engine == "fused", "quick": quick,
            "checks": g.checks, "failures": g.failures}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ih-k", type=int, default=0,
                    help="Irwin-Hall uniforms per gaussian component "
                         "(0 = library default pallas_sweep.IH_K)")
    ap.add_argument("--fused", action="store_true", default=True,
                    help="gate the fused (in-kernel DMA) engine — the "
                         "production default (docs/PERF.md round 3 cont.)")
    ap.add_argument("--no-fused", dest="fused", action="store_false",
                    help="gate the classic per-substep Pallas engine")
    ap.add_argument("--engine", choices=["classic", "fused", "ring"],
                    default=None,
                    help="kernel path to gate (overrides --fused/--no-fused;"
                         " pass the engine that produced the number being"
                         " certified)")
    ap.add_argument("--quick", action="store_true",
                    help="smaller systems/sweeps (the in-bench variant)")
    ap.add_argument("--json-out", default=None,
                    help="also write the summary dict as JSON (the checked-in"
                         " gate artifacts, e.g. docs/rng_gate_k8.json)")
    args = ap.parse_args()

    res = run_gate(args.ih_k, args.fused, args.quick, engine=args.engine)
    status = "PASS" if res["ok"] else "FAIL"
    print(f"{status}  rng gate summary: ih_k={res['ih_k']} "
          f"engine={res['engine']} quick={res['quick']} "
          f"({res['checks']} checks, failures={res['failures']})")
    if args.json_out:
        import json

        import jax as _jax
        res_out = dict(res)
        res_out["device"] = _jax.devices()[0].device_kind
        res_out["jax"] = _jax.__version__
        with open(args.json_out, "w") as f:
            json.dump(res_out, f, indent=1, sort_keys=True)
            f.write("\n")
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
