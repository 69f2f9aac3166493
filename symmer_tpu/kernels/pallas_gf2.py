"""Pallas TPU kernel: blocked symplectic anticommutation matrix.

Computes C[i, j] = parity( popcount(x1_i & z2_j) + popcount(z1_i & x2_j) )
over packed uint32 planes -- the GF(2) inner product behind every
commutation/adjacency query (symmer ``matmul_GF2``, operators/utils.py:9-78).

The XLA fallback (jx_core.anticommutes) materialises the (M1, M2, W)
broadcast in HBM; this kernel tiles (TM, TN) output blocks through VMEM and
accumulates the popcount parity per word without ever leaving on-chip memory,
so arbitrarily large adjacency matrices stream at HBM bandwidth.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 256   # output tile rows
TN = 256   # output tile cols


def _anticommutes_kernel(x1_ref, z1_ref, x2_ref, z2_ref, out_ref):
    # refs: (TM, W) x2 for operand 1; (TN, W) x2 for operand 2; out (TM, TN)
    x1 = x1_ref[:]
    z1 = z1_ref[:]
    x2 = x2_ref[:]
    z2 = z2_ref[:]
    W = x1.shape[1]

    # static unroll over words (dynamic_slice is not lowerable in Pallas TPU);
    # the compiler fuses the whole chain into one VMEM-resident accumulation
    acc = jnp.zeros((x1.shape[0], x2.shape[0]), jnp.uint32)
    for w in range(W):
        a = x1[:, w][:, None] & z2[:, w][None, :]
        b = z1[:, w][:, None] & x2[:, w][None, :]
        pa = jax.lax.population_count(a) + jax.lax.population_count(b)
        acc = acc ^ (pa.astype(jnp.uint32) & 1)
    out_ref[:] = acc.astype(jnp.uint8)


@jax.jit
def anticommutes_pallas(x1, z1, x2, z2):
    """uint8[M1, M2] anticommutation matrix via blocked Pallas kernel.

    Inputs must be uint32[M, W] with M1 % TM == M2 % TN == 0 (callers pad).
    """
    M1, W = x1.shape
    M2 = x2.shape[0]
    grid = (M1 // TM, M2 // TN)
    interpret = jax.default_backend() == "cpu"  # pallas CPU = interpreter only
    return pl.pallas_call(
        _anticommutes_kernel,
        out_shape=jax.ShapeDtypeStruct((M1, M2), jnp.uint8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, W), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, W), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, W), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, W), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x1, z1, x2, z2)


def anticommutes_tiled(x1, z1, x2, z2):
    """Padding wrapper: accepts any (M, W) shapes, returns bool[M1, M2]."""
    import numpy as np

    M1, W = x1.shape
    M2 = x2.shape[0]
    M1p = -(-M1 // TM) * TM
    M2p = -(-M2 // TN) * TN

    def padded(a, Mp):
        if a.shape[0] == Mp:
            return a
        return jnp.pad(a, ((0, Mp - a.shape[0]), (0, 0)))

    out = anticommutes_pallas(
        padded(x1, M1p), padded(z1, M1p), padded(x2, M2p), padded(z2, M2p)
    )
    return out[:M1, :M2].astype(bool)
