"""Pallas fused sparse gather-GEMM: interpret-mode equivalence against the
XLA gather-GEMM (models/sparse_backbone) — same contract the hardware kernel
must meet (sentinel rows, invalid-feature masking, tq remainder blocks)."""
import jax
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.core.voxel.pallas_sparse import fits_vmem, fused_gather_gemm
from dfu3d_tpu.models.sparse_backbone import _gather_gemm


class TestFusedGatherGemm:
    def _case(self, b, v, q, k, cin, cout, tq, seed=0):
        rng = np.random.default_rng(seed)
        feats = jnp.asarray(rng.standard_normal((b, v, cin)), jnp.float32)
        valid = jnp.asarray(rng.random((b, v)) > 0.2)
        nbr = jnp.asarray(rng.integers(0, v + 1, (b, q, k)).astype(np.int32))
        w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1, jnp.float32)
        want = _gather_gemm(feats, valid, nbr, w)
        got = fused_gather_gemm(feats, valid, nbr, w, tq=tq, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_matches_xla_gather_gemm(self):
        self._case(b=2, v=100, q=96, k=27, cin=8, cout=16, tq=32)

    def test_remainder_query_block(self):
        # q not divisible by tq: padded grid rows must not corrupt real rows
        self._case(b=1, v=64, q=50, k=27, cin=8, cout=8, tq=32, seed=1)

    def test_all_sentinel_rows_zero(self):
        b, v, q, k, cin, cout = 1, 16, 16, 27, 8, 8
        feats = jnp.ones((b, v, cin), jnp.float32)
        valid = jnp.ones((b, v), bool)
        nbr = jnp.full((b, q, k), v, jnp.int32)  # all sentinels
        w = jnp.ones((k, cin, cout), jnp.float32)
        got = fused_gather_gemm(feats, valid, nbr, w, tq=16, interpret=True)
        assert float(jnp.max(jnp.abs(got))) == 0.0

    def test_fits_vmem_budget(self):
        assert fits_vmem(60000, 16, 16, jnp.bfloat16)
        assert not fits_vmem(4_000_000, 64, 64, jnp.float32)
