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

Run:  python scripts/validate_in_kernel_rng.py        (needs the TPU)
Exits non-zero on failure; prints one summary line per check.
"""

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

FAIL = 0


def check(name, ok, detail):
    global FAIL
    print(f"{'PASS' if ok else 'FAIL'}  {name}: {detail}")
    if not ok:
        FAIL = 1


def acc_rate(m):
    a = int(np.sum(np.asarray(m.accepted, np.int64)))
    p = int(np.sum(np.asarray(m.proposed, np.int64)))
    return a / p, p


def run(cfg, pot, state, sweeps, in_kernel):
    st, m = run_sweeps_pallas(cfg, pot, state, sweeps, 16, 128, False, False,
                              2, 1, in_kernel)
    _ = float(jnp.sum(m.delta_e))
    return st, m


def hard_disk_case():
    n, phi = 262144, 0.5
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=7, n_moves=16, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=0)
    pot = HardSphere(1.0)
    st0 = init_state(cfg)
    sweeps = 60
    st_h, m_h = run(cfg, pot, st0, sweeps, False)
    st_k, m_k = run(cfg, pot, st0, sweeps, True)

    r_h, p_h = acc_rate(m_h)
    r_k, p_k = acc_rate(m_k)
    # pooled two-proportion z (samples are correlated within a chain, so
    # use a generous 10x-sigma budget — this catches gross bias, the job)
    pool = (r_h + r_k) / 2
    se = math.sqrt(pool * (1 - pool) * (1 / p_h + 1 / p_k))
    z = abs(r_h - r_k) / se
    check("hard-disk acceptance parity", z < 10.0,
          f"host {r_h:.5f} vs in-kernel {r_k:.5f} (z={z:.2f}, "
          f"{p_h:.2e} proposals each)")

    from mcjax.utils.observables import hard_disk_eos_state
    z_h = hard_disk_eos_state(cfg, (st_h.pos, st_h.occ), 1.0)
    z_k = hard_disk_eos_state(cfg, (st_k.pos, st_k.occ), 1.0)
    check("hard-disk contact EOS parity", abs(z_h - z_k) / z_h < 0.05,
          f"Z host {z_h:.3f} vs in-kernel {z_k:.3f}")


def lj_case():
    n, rho = 110592, 0.8
    box = (n / rho) ** (1.0 / 3.0)
    cps = int(box // 2.5)
    cps -= cps % 2
    cfg = SimConfig(dim=3, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=24, n_moves=10, proposal="gaussian", step_size=0.12,
                    beta=0.3, seed=0)
    pot = LennardJones(r_cut=2.5)
    st0 = init_state(cfg, positions=stratified_positions(cfg))
    e0 = float(total_energy_cells(cfg, pot, st0.pos, st0.occ))
    sweeps = 30

    st_h, m_h = run(cfg, pot, st0, sweeps, False)
    st_k, m_k = run(cfg, pot, st0, sweeps, True)
    r_h, _ = acc_rate(m_h)
    r_k, _ = acc_rate(m_k)
    check("3D LJ acceptance parity", abs(r_h - r_k) < 0.01,
          f"host {r_h:.5f} vs in-kernel {r_k:.5f}")

    # dE-anchor: accumulated trace must meet the exact recompute
    for tag, st, m in (("host", st_h, m_h), ("in-kernel", st_k, m_k)):
        e_tr = e0 + float(np.sum(np.asarray(m.delta_e, np.float64)))
        e_ex = float(total_energy_cells(cfg, pot, st.pos, st.occ))
        rel = abs(e_tr - e_ex) / max(abs(e_ex), 1.0)
        check(f"3D LJ dE-anchor ({tag} RNG)", rel < 5e-4,
              f"trace {e_tr:.1f} vs exact {e_ex:.1f} (rel {rel:.2e})")
    # equilibrium energies agree between RNG modes
    ee_h = float(total_energy_cells(cfg, pot, st_h.pos, st_h.occ)) / n
    ee_k = float(total_energy_cells(cfg, pot, st_k.pos, st_k.occ)) / n
    check("3D LJ energy/atom parity", abs(ee_h - ee_k) < 0.05,
          f"host {ee_h:.4f} vs in-kernel {ee_k:.4f}")


if __name__ == "__main__":
    # optional Irwin-Hall K override (gates bench.py --ih-k settings): the
    # host-RNG arm is K-independent, so every check doubles as a K gate
    if len(sys.argv) > 2 and sys.argv[1] == "--ih-k":
        import mcjax.ops.pallas_sweep as _ps
        _ps.IH_K = int(sys.argv[2])
    hard_disk_case()
    lj_case()
    sys.exit(FAIL)
