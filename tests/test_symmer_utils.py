"""Top-level utility tests (modeled on symmer tests/test_symmer_utils.py)."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QuantumState
from symmer_tpu.utils import (
    exact_gs_energy,
    exact_gs_energy_matrix_free,
    get_entanglement_entropy,
    gram_schmidt_from_quantum_state,
    matrix_allclose,
    product_list,
    random_anitcomm_2n_1_PauliwordOp,
    tensor_list,
)

from .conftest import dense_op

rng = np.random.default_rng(9)

# inline H3+ STO-3G Hamiltonian fixture would go here; we use random Hermitian
# operators plus the molecular fixtures from conftest for energy oracles.


def _random_hermitian(n, t):
    op = PauliwordOp.random(n, t)
    return (op + op.dagger).multiply_by_constant(0.5)


def test_exact_gs_energy_matches_dense():
    op = _random_hermitian(4, 10)
    gs, psi = exact_gs_energy(op.to_sparse_matrix)
    evals = np.linalg.eigvalsh(dense_op(op))
    assert np.isclose(gs, evals[0])
    assert np.isclose(op.expval(psi.normalize), gs)


def test_exact_gs_energy_accepts_pauliwordop():
    # passing the operator itself routes small ops through the sparse
    # matrix and wide ones through the matrix-free one-sparse matvec
    op = _random_hermitian(4, 10)
    gs_ref, _ = exact_gs_energy(op.to_sparse_matrix)
    gs_op, psi = exact_gs_energy(op)
    assert np.isclose(gs_op, gs_ref)
    wide = _random_hermitian(17, 6)
    gs_wide, _ = exact_gs_energy(wide)
    gs_free, _ = exact_gs_energy_matrix_free(wide)
    assert np.isclose(gs_wide, gs_free, atol=1e-8)


def test_exact_gs_energy_matrix_free():
    op = _random_hermitian(6, 12)
    gs_dense, _ = exact_gs_energy(op.to_sparse_matrix)
    gs_free, psi = exact_gs_energy_matrix_free(op)
    assert np.isclose(gs_free, gs_dense, atol=1e-8)


def test_exact_gs_energy_particle_number(h2_fixture):
    H = PauliwordOp.from_dictionary(h2_fixture["H_dict"])
    # JW number operator on 4 qubits: sum (I - Z_i)/2
    N_op = PauliwordOp.from_dictionary(
        {"IIII": 2.0, "ZIII": -0.5, "IZII": -0.5, "IIZI": -0.5, "IIIZ": -0.5}
    )
    gs, psi = exact_gs_energy(
        H.to_sparse_matrix, n_particles=2, number_operator=N_op, n_eigs=4
    )
    assert np.isclose(gs, h2_fixture["fci_energy"], atol=1e-8)


def test_random_anticommuting_op():
    for nq in [1, 2, 3, 4]:
        op = random_anitcomm_2n_1_PauliwordOp(nq)
        assert op.n_terms == 2 * nq + 1
        adj = op.adjacency_matrix.copy()
        np.fill_diagonal(adj, False)
        assert not adj.any()


def test_random_anticommuting_no_clifford_structured():
    op = random_anitcomm_2n_1_PauliwordOp(3, apply_clifford=False)
    assert op.n_terms == 7
    adj = op.adjacency_matrix.copy()
    np.fill_diagonal(adj, False)
    assert not adj.any()


def test_tensor_list():
    ops = [PauliwordOp.random(2, 2) for _ in range(3)]
    full = tensor_list(ops)
    expect = np.kron(np.kron(dense_op(ops[0]), dense_op(ops[1])), dense_op(ops[2]))
    assert np.allclose(dense_op(full), expect)


def test_product_list():
    ops = [PauliwordOp.random(3, 3) for _ in range(3)]
    full = product_list(ops)
    expect = dense_op(ops[0]) @ dense_op(ops[1]) @ dense_op(ops[2])
    assert np.allclose(dense_op(full), expect)


def test_gram_schmidt():
    psi = QuantumState.haar_random(3)
    M = gram_schmidt_from_quantum_state(psi)
    assert np.allclose(M @ M.conj().T, np.eye(8), atol=1e-10)
    assert np.allclose(M[:, 0], psi.to_sparse_matrix.toarray().reshape(-1))


def test_entanglement_entropy():
    # product state: zero entropy
    prod = QuantumState(np.array([[0, 1, 0]]), [1])
    assert abs(get_entanglement_entropy(prod, [0])) < 1e-12
    # Bell state: log(2)
    bell = QuantumState(np.array([[0, 0], [1, 1]]), [1 / np.sqrt(2)] * 2)
    assert np.isclose(get_entanglement_entropy(bell, [0]), np.log(2))


def test_matrix_allclose():
    from scipy.sparse import csr_matrix

    A = rng.normal(size=(4, 4))
    assert matrix_allclose(csr_matrix(A), csr_matrix(A))
    assert matrix_allclose(A, A + 1e-16)
    assert not matrix_allclose(A, A + 1)


# ---------------------------------------------------------------------------
# device Lanczos (kernels/jx_lanczos.py, utils.exact_gs_energy_device)
# ---------------------------------------------------------------------------

def test_group_diagonals_reconstruct_dense():
    from symmer_tpu.kernels import dense

    op = _random_hermitian(5, 20)
    ux, D = dense.group_diagonals(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits
    )
    dim = 1 << op.n_qubits
    M = np.zeros((dim, dim), complex)
    rows = np.arange(dim)
    for g, xg in enumerate(ux):
        M[rows, rows ^ xg] += D[g]
    assert np.allclose(M, dense_op(op), atol=1e-12)


def test_lanczos_ground_state_random():
    from symmer_tpu.kernels import jx_lanczos

    op = _random_hermitian(6, 24)
    evals, evecs = jx_lanczos.lanczos_ground_state(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits
    )
    dense_evals, dense_evecs = np.linalg.eigh(dense_op(op))
    assert abs(evals[0] - dense_evals[0]) < 1e-9
    overlap = abs(dense_evecs[:, 0].conj() @ evecs[:, 0])
    assert overlap > 1 - 1e-8


def test_lanczos_excited_states_distinct():
    from symmer_tpu.kernels import jx_lanczos

    op = _random_hermitian(5, 16)
    evals, evecs = jx_lanczos.lanczos_ground_state(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, n_eigs=3
    )
    dense_evals = np.linalg.eigvalsh(dense_op(op))
    # the lowest Ritz value is exact; higher ones must be *distinct* true
    # eigenvalues (ghost dedup), each matching some dense eigenvalue
    assert abs(evals[0] - dense_evals[0]) < 1e-9
    for e in evals[1:]:
        assert np.min(np.abs(dense_evals - e)) < 1e-7
    assert np.all(np.diff(evals) > 1e-9)


def test_exact_gs_energy_device_h2(h2_fixture):
    from symmer_tpu.utils import exact_gs_energy_device

    H = PauliwordOp.from_dictionary(h2_fixture["H_dict"])
    gs, psi = exact_gs_energy_device(H)
    assert abs(gs - h2_fixture["fci_energy"]) < 1e-10
    assert np.isclose(op_expval(H, psi), gs)


def op_expval(H, psi):
    return float(np.real(H.expval(psi.normalize)))


def test_exact_gs_energy_device_particle_number(h2_fixture):
    from symmer_tpu.utils import exact_gs_energy_device

    H = PauliwordOp.from_dictionary(h2_fixture["H_dict"])
    N_op = PauliwordOp.from_dictionary(
        {"IIII": 2.0, "ZIII": -0.5, "IZII": -0.5, "IIZI": -0.5, "IIIZ": -0.5}
    )
    gs, psi = exact_gs_energy_device(
        H, n_particles=2, number_operator=N_op, n_eigs=4
    )
    assert np.isclose(gs, h2_fixture["fci_energy"], atol=1e-8)

def test_lanczos_lowest_eigsh_multiplicity():
    """Deflated restarts resolve degenerate multiplets a single-vector
    Krylov space cannot see: h (2q) tensor I doubles every eigenvalue."""
    from symmer_tpu.kernels import jx_lanczos

    op = _random_hermitian(2, 6).tensor(PauliwordOp.from_dictionary({"I": 1.0}))
    evals, evecs = jx_lanczos.lanczos_lowest_eigsh(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, n_vecs=4
    )
    M = dense_op(op)
    dense_evals = np.linalg.eigvalsh(M)
    assert np.allclose(evals, dense_evals[:4], atol=1e-9)  # WITH multiplicity
    # orthonormal basis of the eigenspaces, each column a true eigenvector
    assert np.allclose(evecs.conj().T @ evecs, np.eye(4), atol=1e-8)
    for e, y in zip(evals, evecs.T):
        assert np.linalg.norm(M @ y - e * y) < 1e-8


def test_lanczos_lowest_eigsh_positive_complement():
    """Regression: once the (negative) ground multiplet is fully locked,
    this operator's remaining spectrum is entirely positive — deflation by
    PROJECTION would park the locked space at a ghost eigenvalue 0 below
    everything and the third sweep would converge to it.  Deflation by
    shifting must return the true third eigenvalue."""
    from symmer_tpu.kernels import jx_lanczos

    op = PauliwordOp.from_dictionary({
        "IYI": -0.914978610534862, "XII": -0.4789641639460487,
        "III": 0.9330343570099389, "ZYI": 0.923948417825471,
    })
    evals, evecs = jx_lanczos.lanczos_lowest_eigsh(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, n_vecs=3
    )
    dense_evals = np.linalg.eigvalsh(dense_op(op))
    assert len(evals) == 3
    assert np.allclose(evals, dense_evals[:3], atol=1e-9)


def test_lanczos_lowest_eigsh_stop_callback():
    from symmer_tpu.kernels import jx_lanczos

    op = _random_hermitian(4, 10)
    calls = []

    def stop(vals, vecs):
        calls.append((len(vals), vecs.shape))
        return len(vals) >= 2

    evals, evecs = jx_lanczos.lanczos_lowest_eigsh(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, n_vecs=5, stop=stop
    )
    assert len(evals) == 2 and evecs.shape == (16, 2)
    assert calls[-1] == (2, (16, 2))


def test_exact_lowest_states_device_public():
    from symmer_tpu.utils import exact_lowest_states_device

    op = _random_hermitian(2, 5).tensor(PauliwordOp.from_dictionary({"I": 1.0}))
    evals, states = exact_lowest_states_device(op, 3)
    dense_evals = np.linalg.eigvalsh(dense_op(op))
    assert np.allclose(evals, dense_evals[:3], atol=1e-9)
    assert len(states) == 3
    for e, psi in zip(evals, states):
        assert abs(op.expval(psi.normalize) - e) < 1e-8
    evals_b, states_b = exact_lowest_states_device(op, 3, method="block")
    assert np.allclose(evals_b, dense_evals[:3], atol=1e-9)
    assert len(states_b) == 3


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lanczos_lowest_eigsh_fuzz(seed):
    """Random spectra with random degeneracy structure: multiplicity-exact
    against dense eigh."""
    from symmer_tpu.kernels import jx_lanczos

    r = np.random.default_rng(seed)
    op = PauliwordOp.random(5, int(r.integers(4, 20)))
    op = (op + op.dagger).multiply_by_constant(0.5).cleanup()
    if r.random() < 0.5:  # force degeneracy half the time
        op = op.tensor(PauliwordOp.from_dictionary({"I": 1.0}))
    n = min(5, 1 << op.n_qubits)
    evals, evecs = jx_lanczos.lanczos_lowest_eigsh(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, n_vecs=n
    )
    M = dense_op(op)
    assert np.allclose(evals, np.linalg.eigvalsh(M)[:n], atol=1e-8)
    assert np.allclose(
        evecs.conj().T @ evecs, np.eye(evecs.shape[1]), atol=1e-7
    )


def test_lanczos_block_eigsh_multiplicity():
    """Block (band) Lanczos resolves degenerate multiplets in ONE
    recurrence; h(2q) (x) I doubles every level."""
    from symmer_tpu.kernels import jx_lanczos

    op = _random_hermitian(2, 6).tensor(PauliwordOp.from_dictionary({"I": 1.0}))
    evals, evecs = jx_lanczos.lanczos_block_eigsh(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, n_vecs=4
    )
    M = dense_op(op)
    dense_evals = np.linalg.eigvalsh(M)
    assert np.allclose(evals, dense_evals[:4], atol=1e-9)
    assert np.allclose(evecs.conj().T @ evecs, np.eye(4), atol=1e-8)
    for e, yv in zip(evals, evecs.T):
        assert np.linalg.norm(M @ yv - e * yv) < 1e-8


@pytest.mark.parametrize("seed", [0, 3])
def test_lanczos_block_eigsh_random(seed):
    from symmer_tpu.kernels import jx_lanczos

    r = np.random.default_rng(seed)
    op = PauliwordOp.random(5, int(r.integers(6, 24)))
    op = (op + op.dagger).multiply_by_constant(0.5).cleanup()
    n = 5
    evals, evecs = jx_lanczos.lanczos_block_eigsh(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, n_vecs=n, block=3
    )
    M = dense_op(op)
    assert np.allclose(evals, np.linalg.eigvalsh(M)[:n], atol=1e-8)
    for e, yv in zip(evals, evecs.T):
        assert np.linalg.norm(M @ yv - e * yv) < 1e-7


def test_lanczos_block_eigsh_mesh():
    """Block recurrence through the mesh-sharded matvec."""
    from symmer_tpu.kernels import jx_lanczos
    from symmer_tpu.parallel.mesh import get_mesh

    op = _random_hermitian(7, 30)
    mesh = get_mesh(8)
    evals, _ = jx_lanczos.lanczos_block_eigsh(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, n_vecs=3, mesh=mesh
    )
    assert np.allclose(
        evals, np.linalg.eigvalsh(dense_op(op))[:3], atol=1e-8
    )


def test_zdiag_vector_matches_dense_diagonal():
    from symmer_tpu.utils import _zdiag_vector

    N_op = PauliwordOp.from_dictionary(
        {"III": 1.5, "ZII": -0.5, "IZI": -0.5, "IIZ": -0.5, "ZZI": 0.25}
    )
    Nd = _zdiag_vector(N_op, 8)
    assert np.allclose(Nd, np.diag(dense_op(N_op)).real, atol=1e-14)


def test_select_by_particle_number_rotates_multiplets():
    """An eigensolver returns an arbitrary basis inside a degenerate
    eigenspace; the sector scan must rotate it onto exact number
    eigenstates before filtering (the reference's round() scan misfires)."""
    from symmer_tpu.utils import _select_by_particle_number

    # ground multiplet of -Z0Z1: span{|00>, |11>}; hand it deliberately
    # mixed combinations with <N> = 1 each (round() would reject both)
    N_op = PauliwordOp.from_dictionary({"II": 1.0, "ZI": -0.5, "IZ": -0.5})
    plus = np.array([1, 0, 0, 1]) / np.sqrt(2)
    minus = np.array([1, 0, 0, -1]) / np.sqrt(2)
    eigvals = np.array([-1.0, -1.0])
    eigvecs = np.stack([plus, minus], axis=1)
    evl, psi = _select_by_particle_number(eigvals, eigvecs, 2, N_op)
    assert evl == -1.0
    amps = psi.to_dense_matrix.reshape(-1)
    assert abs(abs(amps[3]) - 1.0) < 1e-12  # exactly |11>
    evl0, psi0 = _select_by_particle_number(eigvals, eigvecs, 0, N_op)
    amps0 = psi0.to_dense_matrix.reshape(-1)
    assert abs(abs(amps0[0]) - 1.0) < 1e-12  # exactly |00>


def test_select_by_particle_number_rejects_partial_multiplet():
    """Regression (review finding): a vector spanning PART of a degenerate
    multiplet can have <N> rounding to the target while being a sector
    mixture; the selector must reject it (variance check) instead of
    silently returning a non-eigenstate of N."""
    from symmer_tpu.utils import _select_by_particle_number

    # (|00000> + |00011>)/sqrt(2): ground vector of -Z0, <N> = 1 exactly,
    # but a 50/50 mixture of the N=0 and N=2 sectors
    vec = np.zeros(32, complex)
    vec[0] = vec[3] = 1 / np.sqrt(2)
    N_op = PauliwordOp.from_dictionary({
        "IIIII": 2.5, "ZIIII": -0.5, "IZIII": -0.5, "IIZII": -0.5,
        "IIIZI": -0.5, "IIIIZ": -0.5,
    })
    with pytest.raises(RuntimeError):
        _select_by_particle_number(
            np.array([-1.0]), vec.reshape(-1, 1), 1, N_op
        )


def test_exact_gs_energy_device_wide_multiplet_sector_above():
    """Regression (review finding): an 8-fold degenerate ground multiplet
    with NO sector match must not exhaust the sweep budget — the adaptive
    extension reaches the sector state in the level above."""
    from symmer_tpu.utils import exact_gs_energy_device

    H = PauliwordOp.from_dictionary({"ZIII": -2.0})
    N_op = PauliwordOp.from_dictionary({
        "IIII": 2.0, "ZIII": -0.5, "IZII": -0.5, "IIZI": -0.5, "IIIZ": -0.5,
    })
    gs, psi = exact_gs_energy_device(H, n_particles=4, number_operator=N_op)
    assert abs(gs - 2.0) < 1e-9  # |1111> lives in the Z0 = -1 level
    amps = psi.to_dense_matrix.reshape(-1)
    assert abs(abs(amps[15]) - 1.0) < 1e-9


def test_lanczos_block_eigsh_identity_breakdown():
    """Regression (review finding): H = c*I breaks the block recurrence at
    the FIRST residual (pure rounding noise); the threshold truncation must
    keep only the start block, whose columns are already exact
    eigenvectors — no junk, non-orthogonal basis."""
    from symmer_tpu.kernels import jx_lanczos

    op = PauliwordOp.from_dictionary({"III": 2.0})
    evals, evecs = jx_lanczos.lanczos_block_eigsh(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, n_vecs=3, block=2
    )
    assert np.allclose(evals, 2.0, atol=1e-10)
    assert np.allclose(
        evecs.conj().T @ evecs, np.eye(evecs.shape[1]), atol=1e-8
    )


def test_exact_lowest_states_device_block_fallback_identity():
    """Block space closes at the start block for H = c*I; the public API
    falls back to deflated restarts and still returns n_states."""
    from symmer_tpu.utils import exact_lowest_states_device

    op = PauliwordOp.from_dictionary({"II": -1.5})
    evals, states = exact_lowest_states_device(op, 3, method="block")
    assert len(states) == 3 and np.allclose(evals, -1.5, atol=1e-10)


def test_exact_gs_energy_device_degenerate_sector():
    """n_particles filtering inside a degenerate ground multiplet: -Z0Z1
    has ground space span{|00>, |11>}; the 2-particle answer is |11>."""
    from symmer_tpu.utils import exact_gs_energy_device

    H = PauliwordOp.from_dictionary({"ZZ": -1.0})
    N_op = PauliwordOp.from_dictionary({"II": 1.0, "ZI": -0.5, "IZ": -0.5})
    gs, psi = exact_gs_energy_device(
        H, n_particles=2, number_operator=N_op
    )
    assert abs(gs - (-1.0)) < 1e-10
    amps = psi.to_dense_matrix.reshape(-1)
    assert abs(abs(amps[3]) - 1.0) < 1e-10


def test_ship_groups_device_matches_host():
    """The on-chip scatter+FWHT diagonal build produces the same blocks as
    the host FWHT + upload path (padding rows excluded)."""
    from symmer_tpu.kernels import dense, jx_lanczos
    from symmer_tpu.kernels.dispatch import _coeff_dtype, _df_mode

    op = _random_hermitian(6, 40)
    nq, dim = op.n_qubits, 1 << op.n_qubits
    ux, gidx, z_int, ph = dense.group_scatter_inputs(
        op.x_pack, op.z_pack, op.coeff_vec, nq
    )
    _, Dc = dense.group_diagonals(op.x_pack, op.z_pack, op.coeff_vec, nq)
    df, dt = _df_mode(), _coeff_dtype()
    ux_h, D_h = jx_lanczos._ship_groups(ux, Dc, df, dt, np.int32)
    ux_d, D_d = jx_lanczos._ship_groups_device(
        ux, gidx, z_int, ph, nq, df, dt, np.int32
    )
    G, L = ux.shape[0], D_h.shape[-1]
    Dh = np.asarray(D_h, np.float64).reshape(-1, dim, L)[:G]
    Dd = np.asarray(D_d, np.float64).reshape(-1, dim, L)[:G]
    assert np.array_equal(
        np.asarray(ux_h).reshape(-1)[:G], np.asarray(ux_d).reshape(-1)[:G]
    )
    assert np.allclose(Dh, Dd, atol=1e-12)
    # padding rows of the device build must be exactly zero
    tail = np.asarray(D_d, np.float64).reshape(-1, dim, L)[G:]
    assert not tail.size or np.all(tail == 0)


def test_lanczos_device_table_build_path(monkeypatch):
    """End to end through the device-built diagonal table (threshold forced
    to zero so the small test operator takes the big-table branch)."""
    from symmer_tpu.kernels import jx_lanczos

    monkeypatch.setattr(jx_lanczos, "_DEVICE_BUILD_BYTES", 0)
    op = _random_hermitian(6, 24)
    evals, _ = jx_lanczos.lanczos_ground_state(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits
    )
    assert abs(evals[0] - np.linalg.eigvalsh(dense_op(op))[0]) < 1e-9


def test_ship_groups_mesh_device_matches_host():
    """The shard-local scatter+FWHT build (each device computes only its own
    row block from the O(T) triples) reproduces the host-FWHT table."""
    from symmer_tpu.kernels import dense, jx_lanczos
    from symmer_tpu.kernels.dispatch import _coeff_dtype, _df_mode
    from symmer_tpu.parallel.mesh import get_mesh

    op = _random_hermitian(7, 40)
    nq, dim = op.n_qubits, 1 << op.n_qubits
    mesh = get_mesh(8)
    assert jx_lanczos._mesh_ok(mesh, nq)
    ux, gidx, z_int, ph = dense.group_scatter_inputs(
        op.x_pack, op.z_pack, op.coeff_vec, nq
    )
    _, Dc = dense.group_diagonals(op.x_pack, op.z_pack, op.coeff_vec, nq)
    df, dt = _df_mode(), _coeff_dtype()
    ux_h, D_h = jx_lanczos._ship_groups(ux, Dc, df, dt, np.int32)
    ux_m, D_m = jx_lanczos._ship_groups_mesh_device(
        mesh, ux, gidx, z_int, ph, nq, df, dt, np.int32
    )
    G, L = ux.shape[0], D_h.shape[-1]
    Dh = np.asarray(D_h, np.float64).reshape(-1, dim, L)[:G]
    Dm = np.asarray(D_m, np.float64).reshape(-1, dim, L)[:G]
    assert np.array_equal(
        np.asarray(ux_h).reshape(-1)[:G], np.asarray(ux_m).reshape(-1)[:G]
    )
    assert np.allclose(Dh, Dm, atol=1e-12)
    tail = np.asarray(D_m, np.float64).reshape(-1, dim, L)[G:]
    assert not tail.size or np.all(tail == 0)


def test_lanczos_mesh_device_build_end_to_end(monkeypatch):
    """Eigensolve through the mesh path with the shard-local table build
    forced on (threshold zero)."""
    from symmer_tpu.kernels import jx_lanczos
    from symmer_tpu.parallel.mesh import get_mesh

    monkeypatch.setattr(jx_lanczos, "_DEVICE_BUILD_BYTES", 0)
    op = _random_hermitian(7, 40)
    mesh = get_mesh(8)
    evals, _ = jx_lanczos.lanczos_ground_state(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, mesh=mesh
    )
    assert abs(evals[0] - np.linalg.eigvalsh(dense_op(op))[0]) < 1e-9


def test_lanczos_mesh_matches_single_device():
    """Mesh-sharded Lanczos (table sharded over the row-block axis, one
    all-gather per matvec) reproduces the single-device eigensolve."""
    import symmer_tpu
    from symmer_tpu.kernels import jx_lanczos
    from symmer_tpu.parallel.mesh import get_mesh

    op = _random_hermitian(7, 40)
    args = (op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits)
    e1, v1 = jx_lanczos.lanczos_ground_state(*args)
    mesh = get_mesh(8)
    assert jx_lanczos._mesh_ok(mesh, op.n_qubits)
    e2, v2 = jx_lanczos.lanczos_ground_state(*args, mesh=mesh)
    assert abs(e1[0] - e2[0]) < 1e-11
    assert abs(np.vdot(v1[:, 0], v2[:, 0])) > 1 - 1e-9
    # public surface respects config.mesh
    with symmer_tpu.use_mesh(n_devices=8):
        gs, _ = exact_gs_energy_device_public(op)
    assert abs(gs - e1[0]) < 1e-11


def exact_gs_energy_device_public(op):
    from symmer_tpu.utils import exact_gs_energy_device

    return exact_gs_energy_device(op)


def test_lanczos_mesh_fallback_small_row_axis():
    """A mesh the row-block axis cannot split evenly over falls back to the
    single-device path instead of failing (4 qubits: H = 4 < 8 devices)."""
    from symmer_tpu.kernels import jx_lanczos
    from symmer_tpu.parallel.mesh import get_mesh

    op = _random_hermitian(4, 12)
    mesh = get_mesh(8)
    assert not jx_lanczos._mesh_ok(mesh, op.n_qubits)
    evals, _ = jx_lanczos.lanczos_ground_state(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, mesh=mesh
    )
    assert abs(evals[0] - np.linalg.eigvalsh(dense_op(op))[0]) < 1e-9


def test_lanczos_residual_guard():
    """An explicitly too-small Krylov space warns instead of silently
    returning an unconverged energy; auto-k extends itself and converges."""
    import warnings as _w

    from symmer_tpu.kernels import jx_lanczos

    op = _random_hermitian(8, 80)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        evals_small, _ = jx_lanczos.lanczos_ground_state(
            op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits, k=4
        )
    assert any("residual" in str(r.message) for r in rec), "no convergence warning"
    evals_auto, _ = jx_lanczos.lanczos_ground_state(
        op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits
    )
    d0 = np.linalg.eigvalsh(dense_op(op))[0]
    assert abs(evals_auto[0] - d0) < 1e-9
