"""VQE / ADAPT-VQE driver tests."""
import numpy as np
import pytest

from symmer_tpu import PauliwordOp, QuantumState
from symmer_tpu.evolution.variational_optimization import ADAPT_VQE, VQE_Driver, evolve_state
from symmer_tpu.utils import exact_gs_energy

from ..conftest import dense_op


@pytest.fixture
def h2_taper(h2_fixture):
    from symmer_tpu import QubitTapering

    H = PauliwordOp.from_dictionary(h2_fixture["H_dict"])
    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=h2_fixture["hf_array"])
    return H_taper, QT.tapered_ref_state.normalize, h2_fixture["fci_energy"]


def test_evolve_state_matches_dense():
    import scipy.linalg

    gen = PauliwordOp.from_list(["XXI", "IYZ"])
    ref = QuantumState.zero(3)
    x = np.array([0.4, -0.9])
    state = evolve_state(gen, x, ref)
    v = np.zeros(8); v[0] = 1
    U0 = scipy.linalg.expm(1j * x[0] * dense_op(gen[0]))
    U1 = scipy.linalg.expm(1j * x[1] * dense_op(gen[1]))
    assert np.allclose(state.to_sparse_matrix.toarray().reshape(-1), U1 @ U0 @ v)


EXPECTATION_METHODS = [
    "symbolic_direct", "symbolic_projector", "observable_rotation",
    "sparse_array", "dense_array", "device_array",
]


@pytest.mark.parametrize("method", EXPECTATION_METHODS)
def test_expectation_methods_agree(method, h2_taper):
    H_taper, ref, fci = h2_taper
    excitations = PauliwordOp.from_list(["X"])
    driver = VQE_Driver(H_taper, excitation_ops=excitations, ref_state=ref)
    driver.verbose = False
    driver.expectation_eval = method
    x = np.array([0.3])
    # dense oracle
    import scipy.linalg

    v = ref.to_sparse_matrix.toarray().reshape(-1)
    U = scipy.linalg.expm(1j * 0.3 * dense_op(excitations))
    expect = (U @ v).conj() @ dense_op(H_taper) @ (U @ v)
    assert np.isclose(driver.f(x), expect.real, atol=1e-8), method


def test_vqe_reaches_fci_on_h2(h2_taper):
    H_taper, ref, fci = h2_taper
    excitations = PauliwordOp.from_list(["Y"])
    driver = VQE_Driver(H_taper, excitation_ops=excitations, ref_state=ref)
    driver.verbose = False
    opt_out, history = driver.run(x0=np.array([0.1]), method="BFGS")
    assert abs(opt_out["fun"] - fci) < 1e-6
    assert len(history["energy"]) > 0


def test_gradient_matches_finite_difference(h2_taper):
    H_taper, ref, _ = h2_taper
    excitations = PauliwordOp.from_list(["Y", "X"])
    driver = VQE_Driver(H_taper, excitation_ops=excitations, ref_state=ref)
    driver.verbose = False
    x = np.array([0.2, -0.1])
    grad = driver.gradient(x)
    eps = 1e-6
    for i in range(2):
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        fd = (driver.f(xp) - driver.f(xm)) / (2 * eps)
        assert abs(grad[i] - fd) < 1e-5


def test_adapt_vqe_h2(h2_taper):
    H_taper, ref, fci = h2_taper
    pool = PauliwordOp.from_list(["X", "Y", "Z"])
    adapt = ADAPT_VQE(H_taper, excitation_pool=pool, ref_state=ref)
    adapt.verbose = False
    adapt.derivative_eval = "commutators"
    out = adapt.optimize(max_cycles=3)
    assert abs(out["result"]["fun"] - fci) < 1e-6
    assert len(out["adapt_operator"]) >= 1


def test_adapt_vqe_param_shift(h2_taper):
    H_taper, ref, fci = h2_taper
    pool = PauliwordOp.from_list(["Y"])
    adapt = ADAPT_VQE(H_taper, excitation_pool=pool, ref_state=ref)
    adapt.verbose = False
    adapt.derivative_eval = "param_shift"
    out = adapt.optimize(max_cycles=2)
    assert abs(out["result"]["fun"] - fci) < 1e-6


def test_adapt_tetris(be_fixture):
    from symmer_tpu import QubitTapering

    H = PauliwordOp.from_dictionary(be_fixture["hamiltonian"])
    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=be_fixture["data"]["hf_array"])
    ref = QT.tapered_ref_state.normalize
    pool = PauliwordOp.from_list(["YIIII", "IYIII", "IIYII", "XYIII", "IIXYI"])
    adapt = ADAPT_VQE(H_taper, excitation_pool=pool, ref_state=ref)
    adapt.verbose = False
    adapt.TETRIS = True
    adapt.derivative_eval = "commutators"
    out = adapt.optimize(max_cycles=2)
    assert out["result"]["fun"] is not None


def test_adapt_vqe_on_contextual_subspace_lih():
    """End-to-end production flow: LiH -> taper -> 3-qubit contextual subspace
    -> ADAPT-VQE to the subspace ground state."""
    from ..conftest import load_reference_hamiltonian

    data = load_reference_hamiltonian("LiH_STO-3G_SINGLET_JW.json")
    from symmer_tpu import ContextualSubspace, QubitTapering

    H = PauliwordOp.from_dictionary(data["hamiltonian"])
    fci = data["data"]["calculated_properties"]["FCI"]["energy"]
    QT = QubitTapering(H)
    H_taper = QT.taper_it(ref_state=np.asarray(data["data"]["hf_array"]))
    CC = PauliwordOp.from_dictionary(
        data["data"]["auxiliary_operators"]["UCCSD_operator"]
    )
    CC_taper = QT.taper_it(aux_operator=CC)
    CS = ContextualSubspace(
        H_taper,
        noncontextual_strategy="SingleSweep_magnitude",
        reference_state=QT.tapered_ref_state.normalize,
    )
    CS.update_stabilizers(3, aux_operator=CC_taper, strategy="aux_preserving")
    H_cs = CS.project_onto_subspace()
    psi_cs = CS.project_state(QT.tapered_ref_state.normalize).normalize
    gs_cs = exact_gs_energy(H_cs.to_sparse_matrix)[0]
    assert abs(gs_cs - fci) < 0.02  # subspace error

    # ADAPT over a pool of single/double-Y excitations in the subspace
    pool = PauliwordOp.from_list(
        ["YII", "IYI", "IIY", "YXI", "XYI", "IYX", "IXY", "YXX", "XYX", "XXY"]
    )
    adapt = ADAPT_VQE(H_cs, excitation_pool=pool, ref_state=psi_cs)
    adapt.verbose = False
    adapt.derivative_eval = "commutators"
    out = adapt.optimize(max_cycles=8, gtol=1e-5)
    assert abs(out["result"]["fun"] - gs_cs) < 1e-4  # ADAPT reaches subspace gs


def test_device_array_backend_multi_param(h2_taper):
    """Fused device objective + autodiff gradient vs the sparse host backend
    (values must agree to numerical precision; gradient equals the exact
    parameter-shift values)."""
    H_taper, ref, fci = h2_taper
    excitations = PauliwordOp.from_list(["Y", "X", "Z"])
    host = VQE_Driver(H_taper, excitation_ops=excitations, ref_state=ref)
    host.verbose = False
    host.expectation_eval = "sparse_array"
    dev = VQE_Driver(H_taper, excitation_ops=excitations, ref_state=ref)
    dev.verbose = False
    dev.expectation_eval = "device_array"
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = rng.normal(size=3)
        assert np.isclose(dev.f(x), host.f(x), atol=1e-9)
        assert np.allclose(dev.gradient(x), host.gradient(x), atol=1e-8)


def test_device_array_vqe_reaches_fci(h2_taper):
    H_taper, ref, fci = h2_taper
    excitations = PauliwordOp.from_list(["Y"])
    driver = VQE_Driver(H_taper, excitation_ops=excitations, ref_state=ref)
    driver.verbose = False
    driver.expectation_eval = "device_array"
    opt_out, history = driver.run(x0=np.array([0.1]), method="BFGS")
    assert abs(opt_out["fun"] - fci) < 1e-6


def test_adapt_vqe_device_array(h2_taper):
    H_taper, ref, fci = h2_taper
    pool = PauliwordOp.from_list(["X", "Y", "Z"])
    adapt = ADAPT_VQE(H_taper, excitation_pool=pool, ref_state=ref)
    adapt.verbose = False
    adapt.expectation_eval = "device_array"
    adapt.derivative_eval = "commutators"
    out = adapt.optimize(max_cycles=3, atol=1e-8)
    assert abs(out["result"]["fun"] - fci) < 1e-6


def test_device_pool_gradient_matches_commutator_path(h2_taper):
    """One-program device pool gradient == per-commutator host expectations."""
    H_taper, ref, fci = h2_taper
    pool = PauliwordOp.from_list(["X", "Y", "Z"])

    host = ADAPT_VQE(H_taper, excitation_pool=pool, ref_state=ref)
    host.verbose = False
    host.expectation_eval = "symbolic_direct"
    host.opt_parameters = []
    g_host = host.pool_gradient()

    dev = ADAPT_VQE(H_taper, excitation_pool=pool, ref_state=ref)
    dev.verbose = False
    dev.expectation_eval = "device_array"
    dev.opt_parameters = []
    g_dev = dev.pool_gradient()
    assert np.allclose(g_dev, g_host, atol=1e-8), (g_dev, g_host)

    # non-empty ansatz
    host.append_to_adapt_operator([pool[1]])
    host.opt_parameters = [0.37]
    dev.append_to_adapt_operator([pool[1]])
    dev.opt_parameters = [0.37]
    assert np.allclose(dev.pool_gradient(), host.pool_gradient(), atol=1e-8)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_device_array_fuzz_vs_symbolic(seed):
    """Random small systems: device objective/gradient vs the symbolic path
    (random Hermitian observable, random generators incl. duplicates)."""
    r = np.random.default_rng(seed)
    n = int(r.integers(2, 6))
    H = PauliwordOp.random(n, int(r.integers(4, 20)), density=0.6).cleanup()
    H.coeff_vec = H.coeff_vec.real.astype(complex)
    P = int(r.integers(1, 6))
    gens = PauliwordOp.random(n, P, density=0.6)
    gens.coeff_vec[:] = 1
    ref = QuantumState.random(n, int(r.integers(1, 4))).normalize

    sym = VQE_Driver(H, excitation_ops=gens, ref_state=ref)
    sym.verbose = False
    sym.expectation_eval = "symbolic_direct"
    dev = VQE_Driver(H, excitation_ops=gens, ref_state=ref)
    dev.verbose = False
    dev.expectation_eval = "device_array"
    assert sym.n_params == dev.n_params
    for _ in range(3):
        x = r.normal(size=sym.n_params)
        assert np.isclose(dev.f(x), sym.f(x), atol=1e-9), (n, P)
        assert np.allclose(dev.gradient(x), sym.gradient(x), atol=1e-8), (n, P)


def test_device_array_mesh_sharded_hamiltonian(h2_taper):
    """Hamiltonian-term-sharded VQE objective/gradient under use_mesh must
    equal the single-device engine exactly (f64 CPU)."""
    import symmer_tpu

    H_taper, ref, fci = h2_taper
    gens = PauliwordOp.from_list(["Y", "X"])

    single = VQE_Driver(H_taper, excitation_ops=gens, ref_state=ref)
    single.verbose = False
    single.expectation_eval = "device_array"
    x = np.array([0.3, -0.7])
    f0, g0 = single.f(x), single.gradient(x)

    with symmer_tpu.use_mesh():
        sharded_drv = VQE_Driver(H_taper, excitation_ops=gens, ref_state=ref)
        sharded_drv.verbose = False
        sharded_drv.expectation_eval = "device_array"
        f1, g1 = sharded_drv.f(x), sharded_drv.gradient(x)
    assert abs(f0 - f1) < 1e-12, (f0, f1)
    assert np.allclose(g0, g1, atol=1e-12)

    # and an optimization run end-to-end under the mesh
    with symmer_tpu.use_mesh():
        drv = VQE_Driver(H_taper, excitation_ops=PauliwordOp.from_list(["Y"]),
                         ref_state=ref)
        drv.verbose = False
        drv.expectation_eval = "device_array"
        opt_out, _ = drv.run(x0=np.array([0.1]), method="BFGS")
    assert abs(opt_out["fun"] - fci) < 1e-6
