"""Device-mesh sharding tests (8 virtual CPU devices via XLA_FLAGS)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from symmer_tpu.parallel import get_mesh, process, shard_terms


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_shard_terms_placement():
    mesh = get_mesh(8)
    arr = jnp.arange(64 * 4, dtype=jnp.uint32).reshape(64, 4)
    sharded = shard_terms(arr, mesh)
    assert sharded.sharding.is_fully_replicated is False
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(arr))


def test_sharded_square_cleanup():
    """Pauli square with the left operand sharded across the term axis."""
    from symmer_tpu import PauliwordOp
    from symmer_tpu.kernels import jx_core, pack

    np.random.seed(0)
    op = PauliwordOp.random(32, 64).cleanup()
    # host truth
    expected = (op * op).cleanup()

    mesh = get_mesh(8)
    x = shard_terms(jnp.asarray(pack.to_u32(op.x_pack)), mesh)
    z = shard_terms(jnp.asarray(pack.to_u32(op.z_pack)), mesh)
    cr = shard_terms(jnp.asarray(op.coeff_vec.real), mesh)
    ci = shard_terms(jnp.asarray(op.coeff_vec.imag), mesh)

    @jax.jit
    def square(x, z, cr, ci):
        xo, zo, cro, cio = jx_core.mul_pairs(x, z, cr, ci, x, z, cr, ci)
        return jx_core.cleanup_sorted(xo, zo, cro, cio, xo.shape[0], 1e-15)

    xo, zo, cro, cio, n = square(x, z, cr, ci)
    n = int(n)
    got = PauliwordOp.from_planes(
        pack.from_u32(np.asarray(xo)[:n]), pack.from_u32(np.asarray(zo)[:n]),
        np.asarray(cro)[:n] + 1j * np.asarray(cio)[:n], op.n_qubits,
    )
    assert got == expected


def test_sharded_brute_force_energies():
    """Noncontextual nu-search contraction sharded over the assignment axis."""
    import itertools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from symmer_tpu.operators import NoncontextualOp

    np.random.seed(1)
    nc = NoncontextualOp.random(4, n_cliques=3, n_commuting_terms=4)
    G = nc.symmetry_generators.n_terms
    nu_list = np.array(list(itertools.product([-1, 1], repeat=G)))
    expected = nc.get_energies_batch(nu_list)

    mesh = get_mesh(8, axis_name="nu")
    F = jnp.asarray((nc.G_indices == 1).astype(np.float32))
    base = jnp.asarray((nc.coeff_vec * nc.pauli_mult_signs).real.astype(np.float32))
    mS0 = jnp.asarray(nc.mask_S0.astype(np.float32))
    mCi = jnp.asarray(nc.mask_Ci.astype(np.float32))
    # pad nu axis to a multiple of 8 for even sharding
    K = nu_list.shape[0]
    Kp = ((K + 7) // 8) * 8
    neg = np.zeros((Kp, G), np.float32)
    neg[:K] = nu_list == -1
    neg_sharded = jax.device_put(jnp.asarray(neg), NamedSharding(mesh, P("nu", None)))

    @jax.jit
    def energies(F, neg, base, mS0, mCi):
        parity = jnp.mod(neg @ F.T, 2.0)  # (K, M)
        signed = (1.0 - 2.0 * parity) * base[None, :]
        s0 = signed @ mS0
        si = signed @ mCi.T
        return s0 - jnp.linalg.norm(si, axis=1)

    out = np.asarray(energies(F, neg_sharded, base, mS0, mCi))[:K]
    assert np.allclose(out, expected, atol=1e-4)


def test_process_parallelize_api():
    @process.parallelize
    def f(i, shared):
        return i * shared

    assert f(range(10), 3) == [i * 3 for i in range(10)]
    process.method = "single_thread"
    assert f(range(5), 2) == [0, 2, 4, 6, 8]
    process.method = "vectorised"


def test_process_mp_backend():
    """fork-based pool works with locally-defined decorated functions."""
    offset = 7

    @process.parallelize
    def f(i, shared):
        return i * shared + offset

    process.method = "mp"
    try:
        out = f(range(23), 2)
    finally:
        process.method = "vectorised"
    assert out == [i * 2 + 7 for i in range(23)]


def test_distributed_init_single_process_noop():
    """distributed_init is a safe no-op without a coordinator: returns the
    local device count and leaves use_mesh functional (docs/scaling.md)."""
    import symmer_tpu

    n = symmer_tpu.distributed_init()
    import jax

    assert n == len(jax.devices())
    from symmer_tpu.parallel.mesh import get_mesh

    mesh = get_mesh()
    assert int(mesh.devices.size) == n


def test_distributed_wide_multiply_matches_host():
    """Word-axis-sharded single-term product (SURVEY §2.3 qubit-axis
    dimension): planes and phase bitwise-match the host product."""
    import numpy as np

    from symmer_tpu import PauliwordOp
    from symmer_tpu.parallel.sharded import distributed_wide_multiply

    np.random.seed(21)
    nq = 2000  # 32 uint64 words -> 64 device words, 8 per virtual device
    a = PauliwordOp.random(nq, 1)
    b = PauliwordOp.random(nq, 1)
    host = a * b
    mesh = get_mesh(8)
    out = distributed_wide_multiply(a, b, mesh=mesh)
    assert np.array_equal(out.x_pack, host.x_pack)
    assert np.array_equal(out.z_pack, host.z_pack)
    assert np.allclose(out.coeff_vec, host.coeff_vec, atol=1e-14)

    import pytest

    with pytest.raises(ValueError):
        distributed_wide_multiply(
            PauliwordOp.random(nq, 2), b, mesh=mesh
        )


def test_distributed_wide_commutes_matches_host():
    import numpy as np

    from symmer_tpu import PauliwordOp
    from symmer_tpu.parallel.sharded import distributed_wide_commutes

    np.random.seed(22)
    mesh = get_mesh(8)
    nq = 2000
    agree = 0
    for _ in range(6):
        a, b = PauliwordOp.random(nq, 1), PauliwordOp.random(nq, 1)
        host = bool(a.commutes(b))
        assert distributed_wide_commutes(a, b, mesh=mesh) == host
        agree += 1
    assert agree == 6
