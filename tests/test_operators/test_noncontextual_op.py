"""NoncontextualOp tests (modeled on symmer tests/test_operators/test_noncontextual_op.py)."""
import itertools

import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QuantumState
from symmer_tpu.operators import IndependentOp, NoncontextualOp
from symmer_tpu.utils import exact_gs_energy


def _h2_taper(h2_fixture):
    from symmer_tpu import QubitTapering

    H = PauliwordOp.from_dictionary(h2_fixture["H_dict"])
    QT = QubitTapering(H)
    return QT.taper_it(ref_state=h2_fixture["hf_array"])


def test_contextual_rejected():
    with pytest.raises(AssertionError):
        NoncontextualOp.from_PauliwordOp(PauliwordOp.from_list(["XX", "YY", "ZZ", "XY"]))


def test_diag_strategy(h2_fixture):
    H = PauliwordOp.from_dictionary(h2_fixture["H_dict"])
    # H2 JW is itself noncontextual; skip the early-exit to force the strategy
    nc = NoncontextualOp.from_hamiltonian(
        H, strategy="diag", override_noncontextuality_check=True
    )
    assert not np.any(nc.X_block)
    assert nc.is_noncontextual


def test_from_hamiltonian_noncontextual_early_exit(h2_fixture):
    # reference default (noncontextual_op.py:63-106): an already-noncontextual
    # H returns whole with a warning, ignoring the strategy
    import warnings as _w

    H = PauliwordOp.from_dictionary(h2_fixture["H_dict"])
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        nc = NoncontextualOp.from_hamiltonian(H, strategy="diag")
    assert nc.n_terms == H.n_terms
    assert any("already noncontextual" in str(r.message) for r in rec)


@pytest.mark.parametrize(
    "strategy",
    ["diag", "DFS_magnitude", "DFS_largest", "SingleSweep_magnitude",
     "SingleSweep_random", "SingleSweep_CurrentOrder"],
)
def test_extraction_strategies_produce_noncontextual(strategy, be_fixture):
    np.random.seed(0)
    H = PauliwordOp.from_dictionary(be_fixture["hamiltonian"])
    nc = NoncontextualOp.from_hamiltonian(H, strategy=strategy, DFS_runtime=2)
    assert nc.is_noncontextual
    assert nc.n_terms <= H.n_terms


def test_generators_strategy(be_fixture):
    H = PauliwordOp.from_dictionary(be_fixture["hamiltonian"])
    gens = PauliwordOp.from_list(["IIIIIZIIIZ", "IIIIZIIIZI"])
    nc = NoncontextualOp.from_hamiltonian(H, strategy="generators", generators=gens)
    assert nc.is_noncontextual


def test_random_noncontextual_op():
    np.random.seed(1)
    nc = NoncontextualOp.random(4, n_cliques=3, n_commuting_terms=4)
    assert nc.is_noncontextual
    assert nc.n_cliques == 3


def test_reconstruction_masks():
    np.random.seed(2)
    nc = NoncontextualOp.random(4, n_cliques=2, n_commuting_terms=4)
    assert nc.G_indices.shape == (nc.n_terms, nc.symmetry_generators.n_terms)
    assert nc.C_indices.shape == (nc.n_terms, nc.n_cliques)
    # every term is either pure-symmetry or belongs to exactly one clique
    assert np.all(np.sum(nc.C_indices, axis=1) <= 1)


def test_brute_force_matches_exhaustive_objective():
    np.random.seed(3)
    nc = NoncontextualOp.random(4, n_cliques=3, n_commuting_terms=4)
    nc.solve(strategy="brute_force")
    G = nc.symmetry_generators.n_terms
    best = min(
        nc.get_energy(np.array(nu)) for nu in itertools.product([-1, 1], repeat=G)
    )
    assert np.isclose(nc.energy, best, atol=1e-12)


def test_energies_batch_matches_loop():
    np.random.seed(4)
    nc = NoncontextualOp.random(4, n_cliques=2, n_commuting_terms=4)
    G = nc.symmetry_generators.n_terms
    nu_list = np.array(list(itertools.product([-1, 1], repeat=G)))
    batch = nc.get_energies_batch(nu_list)
    loop = np.array([nc.get_energy(nu) for nu in nu_list])
    assert np.allclose(batch, loop, atol=1e-12)


def test_solve_with_reference_fixes_sector(h2_fixture):
    H_taper = _h2_taper(h2_fixture)
    # H2 tapered is 1 qubit: the noncontextual part with ref state
    nc = NoncontextualOp.from_hamiltonian(H_taper, strategy="diag")
    nc.solve(strategy="brute_force")
    assert nc.energy <= 0


def test_binary_relaxation():
    np.random.seed(5)
    nc = NoncontextualOp.random(3, n_cliques=2, n_commuting_terms=2)
    nc.solve(strategy="binary_relaxation")
    e_relax = nc.energy
    nc.solve(strategy="brute_force")
    assert e_relax >= nc.energy - 1e-8


@pytest.mark.parametrize("seed", [104, 109, 117])
def test_noncontextual_energy_attains_ground(seed):
    """The classical (nu, r) objective of a noncontextual Hamiltonian
    attains the TRUE ground energy exactly (Kirby-Love), not merely an
    upper bound — brute-force solve vs dense diagonalisation."""
    np.random.seed(seed)
    H = PauliwordOp.random(4, 12, complex_coeffs=False)
    H.coeff_vec = H.coeff_vec.real.astype(complex)
    H = (H + H.dagger).multiply_by_constant(0.5).cleanup()
    nc = NoncontextualOp.from_hamiltonian(
        H, strategy="SingleSweep_magnitude",
        override_noncontextuality_check=True,
    )
    nc.solve(strategy="brute_force")
    dense_ground = np.linalg.eigvalsh(
        np.asarray(nc.to_sparse_matrix.todense())
    )[0]
    assert abs(nc.energy - dense_ground) < 1e-8


def test_noncontextual_energy_upper_bounds_ground_state():
    np.random.seed(6)
    nc = NoncontextualOp.random(4, n_cliques=3, n_commuting_terms=4)
    nc.solve()
    gs, _ = exact_gs_energy(nc.to_sparse_matrix)
    assert nc.energy >= gs - 1e-8


def test_noncon_state_energy_consistency():
    np.random.seed(7)
    nc = NoncontextualOp.random(4, n_cliques=3, n_commuting_terms=4)
    nc.solve()
    for method in ["LCU", "seq_rot"]:
        psi, nu = nc.noncon_state(UP_method=method)
        e = nc.expval(psi.normalize)
        assert np.isclose(e, nc.energy, atol=1e-6), method


def test_noncontextual_hf_energy(be_fixture):
    H = PauliwordOp.from_dictionary(be_fixture["hamiltonian"])
    from symmer_tpu import QubitTapering

    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=be_fixture["data"]["hf_array"])
    nc = NoncontextualOp.from_hamiltonian(H_taper, strategy="SingleSweep_magnitude")
    nc.solve(strategy="brute_force")
    hf = be_fixture["data"]["calculated_properties"]["HF"]["energy"]
    assert np.isclose(nc.energy, hf)


def test_draw_graph_structure_smoke():
    import matplotlib

    matplotlib.use("Agg")
    np.random.seed(11)
    nc = NoncontextualOp.random(3, n_cliques=2, n_commuting_terms=2)
    nc.draw_graph_structure()


def test_plot_state_smoke():
    import matplotlib

    matplotlib.use("Agg")
    psi = QuantumState.random(3, 4)
    psi.normalize.plot_state()
    psi.normalize.plot_state(logscale=True, binary_xlabels=True)


# ---------------------------------------------------------------------------
# device-enumerated (and mesh-sharded) brute force
# ---------------------------------------------------------------------------

def _device_vs_host_solution(nc, fixed_ev_mask=None, fixed_eigvals=None):
    from symmer_tpu.operators.noncontextual_op import NoncontextualSolver

    solver = NoncontextualSolver(nc, fixed_ev_mask, fixed_eigvals)
    e_host, nu_host = solver.energy_via_brute_force()
    free = int(np.sum(~solver.fixed_ev_mask))
    e_dev, nu_dev = solver._brute_force_device(free)
    return (e_host, nu_host), (e_dev, nu_dev)


def test_brute_force_device_matches_host():
    np.random.seed(11)
    nc = NoncontextualOp.random(6, n_cliques=3, n_commuting_terms=12)
    (e_host, nu_host), (e_dev, nu_dev) = _device_vs_host_solution(nc)
    assert np.isclose(e_dev, e_host, atol=1e-10)
    assert np.array_equal(nu_dev, nu_host)


def test_brute_force_device_respects_fixed_eigenvalues():
    np.random.seed(12)
    nc = NoncontextualOp.random(6, n_cliques=2, n_commuting_terms=10)
    G = nc.symmetry_generators.n_terms
    if G < 2:
        pytest.skip("need at least two generators")
    mask = np.zeros(G, dtype=bool)
    mask[0] = True
    fixed = np.array([-1])
    (e_host, nu_host), (e_dev, nu_dev) = _device_vs_host_solution(nc, mask, fixed)
    assert nu_dev[0] == -1
    assert np.isclose(e_dev, e_host, atol=1e-10)
    assert np.array_equal(nu_dev, nu_host)


def test_brute_force_device_sharded_over_mesh():
    """Mesh-sharded assignment search (8 virtual devices) == host exhaustive."""
    from symmer_tpu import use_mesh

    np.random.seed(13)
    nc = NoncontextualOp.random(8, n_cliques=2, n_commuting_terms=24)
    from symmer_tpu.operators.noncontextual_op import NoncontextualSolver

    solver = NoncontextualSolver(nc)
    e_host, nu_host = solver.energy_via_brute_force()
    free = int(np.sum(~solver.fixed_ev_mask))
    with use_mesh(axis_name="nu"):
        e_dev, nu_dev = solver._brute_force_device(free)
    assert np.isclose(e_dev, e_host, atol=1e-10)
    assert np.array_equal(nu_dev, nu_host)


@pytest.mark.slow
def test_brute_force_large_G_flat_memory():
    """|G| = 22: 4M assignments -- must not materialise a 4M x G host matrix."""
    import tracemalloc

    np.random.seed(14)
    # diagonal operator with 22 independent Z generators
    G = 22
    strings, coeffs = [], []
    rng = np.random.default_rng(0)
    for i in range(G):
        s = ["I"] * G
        s[i] = "Z"
        strings.append("".join(s))
        coeffs.append(rng.normal())
    nc = NoncontextualOp.from_hamiltonian(
        PauliwordOp.from_list(strings, coeffs), strategy="diag"
    )
    tracemalloc.start()
    nc.solve(strategy="brute_force")
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # exact optimum: every Z picks the sign opposing its coefficient
    expected = -np.sum(np.abs(coeffs))
    assert np.isclose(nc.energy, expected, atol=1e-8)
    assert peak < 512 * 1024 * 1024


def test_brute_force_host_chunked_matches_device():
    """backend='host' routes large searches through the chunked host loop;
    the chunked (min, argmin) must match the single-contraction result and
    the device-enumerated search."""
    from symmer_tpu.config import config
    from symmer_tpu.operators.noncontextual_op import NoncontextualSolver

    np.random.seed(5)
    nc = NoncontextualOp.random(8, n_cliques=2, n_commuting_terms=24)
    solver = NoncontextualSolver(nc)
    e_ref, nu_ref = solver.energy_via_brute_force()
    old_chunk, old_backend = config.brute_force_host_chunk, config.backend
    try:
        config.brute_force_host_chunk = 64  # forces many chunks
        config.backend = "host"
        e_chunked, nu_chunked = solver.energy_via_brute_force()
    finally:
        config.brute_force_host_chunk = old_chunk
        config.backend = old_backend
    assert abs(e_chunked - e_ref) < 1e-10
    assert np.array_equal(nu_chunked, nu_ref)


def test_brute_force_infeasible_search_raises():
    from symmer_tpu.operators.noncontextual_op import NoncontextualSolver

    np.random.seed(1)
    nc = NoncontextualOp.random(6, n_cliques=2, n_commuting_terms=16)
    solver = NoncontextualSolver(nc)
    solver.fixed_ev_mask = np.zeros(40, dtype=bool)  # 40 free generators
    solver.fixed_eigvals = np.array([], dtype=int)
    with pytest.raises(ValueError, match="infeasible"):
        solver.energy_via_brute_force()
