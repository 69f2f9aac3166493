"""Parity of the fused one-round-trip device projection
(S3Projection._perform_projection_device / jx_core.clifford_project_cleanup)
against the unfused host path (rotate -> commute filter -> sign flip ->
column delete -> cleanup), which is itself validated against the reference
semantics in test_qubit_tapering.py."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QubitTapering
from symmer_tpu.config import config
from symmer_tpu.operators import IndependentOp
from symmer_tpu.profiling import kernel_stats
from symmer_tpu.projection.base import S3Projection

rng = np.random.default_rng(7)


def synthetic_symmetric_operator(n_qubits=24, n_terms=300, n_sym=3, seed=0):
    """Random operator with n_sym planted Z2 symmetries (block X-parity)."""
    r = np.random.default_rng(seed)
    block = n_qubits // n_sym
    xb = r.integers(0, 2, (n_terms, n_qubits)).astype(bool)
    zb = r.integers(0, 2, (n_terms, n_qubits)).astype(bool)
    for k in range(n_sym):
        parity = xb[:, k * block : (k + 1) * block].sum(axis=1) & 1
        xb[parity == 1, k * block] ^= True
    coeffs = r.normal(size=n_terms) + 1j * r.normal(size=n_terms)
    return PauliwordOp(np.hstack([xb, zb]), coeffs).cleanup()


def _dicts_close(a, b, tol=1e-10):
    da, db = a.to_dictionary, b.to_dictionary
    assert set(da) == set(db), set(da) ^ set(db)
    worst = max((abs(da[k] - db[k]) for k in da), default=0.0)
    assert worst < tol, worst


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_taper_matches_host_path(seed):
    H = synthetic_symmetric_operator(seed=seed)
    ref_state = np.zeros(H.n_qubits, dtype=int)
    old = config.backend
    try:
        config.backend = "host"
        qt_h = QubitTapering(H)
        host_out = qt_h.taper_it(ref_state=ref_state)
        config.backend = "device"
        kernel_stats.reset()
        qt_d = QubitTapering(H)
        dev_out = qt_d.taper_it(ref_state=ref_state)
    finally:
        config.backend = old
    assert kernel_stats.device_calls["clifford_rotate_project"] >= 1, (
        "fused device projection was not taken"
    )
    assert dev_out.n_qubits == host_out.n_qubits
    _dicts_close(dev_out, host_out)


def test_fused_projection_negative_and_mixed_sectors():
    """Sign flips on both X- and Z-side stabilized columns, sector -1/+1."""
    H = synthetic_symmetric_operator(n_qubits=18, n_terms=200, n_sym=3, seed=5)
    old = config.backend
    try:
        config.backend = "host"
        qt = QubitTapering(H)
        n_sym = qt.symmetry_generators.n_terms
        sector = np.array([(-1) ** k for k in range(n_sym)])
        host_out = qt.taper_it(sector=sector)
        config.backend = "device"
        kernel_stats.reset()
        qt_d = QubitTapering(H)
        dev_out = qt_d.taper_it(sector=sector)
    finally:
        config.backend = old
    assert kernel_stats.device_calls["clifford_rotate_project"] >= 1
    _dicts_close(dev_out, host_out)


def test_fused_projection_zero_sector_acts_as_plus_one():
    """A 0-valued eigenvalue assignment behaves as +1 (the host path and the
    reference set eigval_assignment[assignment == 0] = 1, base.py:67-72).
    Exercised DIRECTLY on single-qubit stabilizers so the 0-coefficient
    stabilizer is not silently dropped by a rotation cleanup first."""
    n = 10
    H = PauliwordOp.from_list(
        ["ZIXXIIIIII", "IZXXIIIIII", "ZZYYIIIIII", "IIXXIIIIII",
         "ZIIIXXIIII", "IIIIXXIIII"],
        [1, 2, 3, 4, 5, 6],
    )
    stabs = IndependentOp.from_list(
        ["Z" + "I" * (n - 1), "I" + "Z" + "I" * (n - 2)], [1, 1]
    )
    old = config.backend
    try:
        config.backend = "host"
        p1 = S3Projection(stabs)
        host_out = p1.perform_projection(H.copy(), sector=np.array([0, 1]))
        config.backend = "device"
        p2 = S3Projection(stabs)
        dev_out = p2.perform_projection(H.copy(), sector=np.array([0, 1]))
    finally:
        config.backend = old
    _dicts_close(dev_out, host_out)


def test_fused_projection_direct_s3():
    """Direct S3Projection on hand-built single-qubit stabilizers (no
    rotations needed) -- exercises the empty-rotation fused path."""
    n = 12
    H = PauliwordOp.random(n, 180, density=0.5).cleanup()
    stabs = IndependentOp.from_list(
        ["Z" + "I" * (n - 1), "I" + "Z" + "I" * (n - 2)], [1, -1]
    )
    old = config.backend
    try:
        config.backend = "host"
        p1 = S3Projection(stabs)
        host_out = p1.perform_projection(H.copy(), sector=np.array([1, -1]))
        config.backend = "device"
        p2 = S3Projection(stabs)
        dev_out = p2.perform_projection(H.copy(), sector=np.array([1, -1]))
    finally:
        config.backend = old
    _dicts_close(dev_out, host_out)


def test_fused_projection_in_cs_vqe_flow(be_fixture):
    """ContextualSubspace.project_onto_subspace on Be STO-3G: taper, then
    UP rotations (non-Clifford, device-resident rotation path), then the
    fused device projection; must match the full host flow."""
    from symmer_tpu import ContextualSubspace

    H = PauliwordOp.from_dictionary(be_fixture["hamiltonian"])
    hf = be_fixture["data"]["hf_array"]
    old = config.backend

    def flow():
        qt = QubitTapering(H)
        H_taper = qt.taper_it(ref_state=hf)
        cs = ContextualSubspace(H_taper, noncontextual_strategy="SingleSweep_magnitude")
        cs.update_stabilizers(3, strategy="aux_preserving")
        return cs.project_onto_subspace()

    try:
        config.backend = "host"
        host_out = flow()
        config.backend = "device"
        kernel_stats.reset()
        dev_out = flow()
    finally:
        config.backend = old
    assert kernel_stats.device_calls["clifford_rotate_project"] >= 1, (
        "fused projection not reached in the CS flow"
    )
    assert dev_out.n_qubits == host_out.n_qubits == 3
    _dicts_close(dev_out, host_out, tol=1e-8)


def test_fused_projection_in_subspace_manager_flow(be_fixture):
    """QubitSubspaceManager end-to-end (taper + contextual subspace) with the
    device backend == host backend, through the manager orchestration API."""
    from symmer_tpu import QubitSubspaceManager

    H = PauliwordOp.from_dictionary(be_fixture["hamiltonian"])
    hf = np.asarray(be_fixture["data"]["hf_array"])
    old = config.backend

    def flow():
        np.random.seed(0)
        qsm = QubitSubspaceManager(H, ref_state=hf)
        return qsm.get_reduced_hamiltonian(3)

    try:
        config.backend = "host"
        host_out = flow()
        config.backend = "device"
        kernel_stats.reset()
        dev_out = flow()
    finally:
        config.backend = old
    assert kernel_stats.device_calls["clifford_rotate_project"] >= 1
    assert dev_out.n_qubits == host_out.n_qubits == 3
    _dicts_close(dev_out, host_out, tol=1e-8)


def test_taper_under_mesh_matches_single_device():
    """Tapering inside use_mesh: rotations route through the term-sharded
    kernels (the fused single-device projection defers to them above the
    mesh threshold) and the result matches the host flow exactly."""
    import symmer_tpu

    H = synthetic_symmetric_operator(n_qubits=24, n_terms=3000, n_sym=3, seed=21)
    # integer coefficients: sharded partial sums are exact in any float width
    r = np.random.default_rng(3)
    H = PauliwordOp.from_planes(
        H.x_pack, H.z_pack,
        (r.integers(-8, 9, H.n_terms) + 1j * r.integers(-8, 9, H.n_terms)).astype(complex),
        H.n_qubits,
    )
    ref_state = np.zeros(H.n_qubits, dtype=int)
    host_out = QubitTapering(H).taper_it(ref_state=ref_state)
    old = config.mesh_threshold
    config.mesh_threshold = 1024
    try:
        kernel_stats.reset()
        with symmer_tpu.use_mesh():
            mesh_out = QubitTapering(H).taper_it(ref_state=ref_state)
    finally:
        config.mesh_threshold = old
    assert sum(kernel_stats.mesh_calls.values()) >= 1, "no sharded kernel ran"
    _dicts_close(mesh_out, host_out, tol=1e-10)
