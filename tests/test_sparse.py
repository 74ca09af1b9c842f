"""Sparse runtime tests: tensor invariants, conv vs dense conv, pooling
roundtrip, attention modes vs brute-force masked reference."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.sparse import attention as sa
from gvfdiffusion_tpu.sparse.conv import SparseConv3d, gather_neighbors
from gvfdiffusion_tpu.sparse.ops import (
    SparseGroupNorm, SparseLayerNorm, SparseLinear, sparse_downsample,
    sparse_subdivide, sparse_upsample,
)
from gvfdiffusion_tpu.sparse.tensor import SparseVoxels, from_dense, from_lists


def random_sparse(rng, b=2, l=64, c=8, res=16, fill=0.7):
    k1, k2, k3 = jax.random.split(rng, 3)
    # unique coords per sample
    coords = []
    for i in range(b):
        lin = np.random.default_rng(i).choice(res**3, size=l, replace=False)
        coords.append(np.stack([lin // (res * res), (lin // res) % res, lin % res], -1))
    coords = jnp.asarray(np.stack(coords), jnp.int32)
    valid = jnp.arange(l)[None, :] < jnp.asarray([int(l * fill), l])[:b, None]
    feats = jax.random.normal(k1, (b, l, c)) * valid[..., None]
    return SparseVoxels(feats=feats, coords=coords, valid=valid, resolution=res)


def test_dense_roundtrip():
    x = random_sparse(jax.random.PRNGKey(0))
    dense = x.to_dense()
    assert dense.shape == (2, 16, 16, 16, 8)
    # every valid voxel's feats appear at its cell
    xs = np.asarray(x.coords)
    fv = np.asarray(x.feats)
    dv = np.asarray(dense)
    for bidx in range(2):
        for i in range(64):
            if bool(x.valid[bidx, i]):
                np.testing.assert_allclose(
                    dv[bidx, xs[bidx, i, 0], xs[bidx, i, 1], xs[bidx, i, 2]],
                    fv[bidx, i], atol=1e-6,
                )


def test_from_dense_extracts_occupied():
    dense = jnp.zeros((1, 8, 8, 8, 4)).at[0, 1, 2, 3].set(1.0).at[0, 4, 5, 6].set(2.0)
    sp = from_dense(dense, capacity=16)
    assert int(sp.counts()[0]) == 2
    got = set(map(tuple, np.asarray(sp.coords[0])[np.asarray(sp.valid[0])].tolist()))
    assert got == {(1, 2, 3), (4, 5, 6)}


def test_index_grid_neighbors():
    x = from_lists(
        [np.array([[1, 1, 1], [1, 1, 2], [3, 3, 3]])],
        [np.arange(3, dtype=np.float32)[:, None] + 1.0],
        resolution=8,
    )
    nb = gather_neighbors(x, (0, 0, 1))
    # voxel (1,1,1) has neighbor (1,1,2) with feat 2; others have none
    np.testing.assert_allclose(np.asarray(nb)[0, :, 0], [2.0, 0.0, 0.0])


def test_sparse_conv_matches_dense_conv():
    rng = jax.random.PRNGKey(1)
    x = random_sparse(rng, b=1, l=32, c=4, res=8, fill=1.0)
    conv = SparseConv3d(features=6, kernel_size=3, use_bias=False)
    params = conv.init(jax.random.PRNGKey(2), x)
    out = conv.apply(params, x)

    # dense reference: scatter to grid, full 3^3 conv, gather at voxels.
    # NOTE submanifold conv computes outputs ONLY at occupied cells but reads
    # all occupied neighbors — identical to dense conv sampled at occupied
    # cells when the input grid is the dense scatter of the sparse tensor.
    dense = np.asarray(x.to_dense())[0]  # [R,R,R,C]
    w = np.asarray(params["params"]["kernel"]).reshape(3, 3, 3, 4, 6)
    padded = np.pad(dense, ((1, 1), (1, 1), (1, 1), (0, 0)))
    expect = np.zeros((8, 8, 8, 6))
    for i in range(3):
        for j in range(3):
            for k in range(3):
                expect += padded[i : i + 8, j : j + 8, k : k + 8] @ w[i, j, k]
    for s in range(32):
        cx, cy, cz = np.asarray(x.coords[0, s])
        np.testing.assert_allclose(
            np.asarray(out.feats[0, s]), expect[cx, cy, cz], atol=1e-4
        )


def test_downsample_mean_and_upsample():
    # two children in the same parent cell -> parent feat = sum/(n+1),
    # reproducing the reference's scatter_reduce include_self quirk
    # (sparse/ops.sparse_downsample docstring): [2,4] -> 2.0, [10] -> 5.0
    x = from_lists(
        [np.array([[0, 0, 0], [0, 0, 1], [4, 4, 4]])],
        [np.array([[2.0], [4.0], [10.0]])],
        resolution=8,
    )
    parents, c2p = sparse_downsample(x, 2)
    assert parents.resolution == 4
    assert int(parents.counts()[0]) == 2
    pf = np.asarray(parents.feats[0])[np.asarray(parents.valid[0])]
    assert sorted(pf[:, 0].tolist()) == [2.0, 5.0]
    # upsample: children get their parent's value
    up = sparse_upsample(parents, x, c2p)
    vals = np.asarray(up.feats[0])[:3, 0]
    np.testing.assert_allclose(vals, [2.0, 2.0, 5.0])


def test_subdivide():
    x = from_lists([np.array([[1, 2, 3]])], [np.array([[5.0]])], resolution=4)
    y = sparse_subdivide(x)
    assert y.resolution == 8
    assert int(y.counts()[0]) == 8
    got = set(map(tuple, np.asarray(y.coords[0]).tolist()))
    assert (2, 4, 6) in got and (3, 5, 7) in got


def test_group_norm_masked_stats():
    x = random_sparse(jax.random.PRNGKey(3), b=2, l=32, c=8, fill=0.5)
    gn = SparseGroupNorm(num_groups=2)
    params = gn.init(jax.random.PRNGKey(4), x)
    out = gn.apply(params, x)
    f = np.asarray(out.feats[0])
    v = np.asarray(x.valid[0])
    # normalized: per-group mean ~0, var ~1 over valid voxels
    grp = f[v][:, :4]
    assert abs(grp.mean()) < 1e-4
    np.testing.assert_allclose(grp.std(), 1.0, atol=1e-2)


def brute_force_masked_attention(q, k, v, mask):
    logits = np.einsum("bihd,bjhd->bhij", q, k) / np.sqrt(q.shape[-1])
    logits = np.where(mask[:, None], logits, -1e30)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhij,bjhd->bihd", w, v)


def test_full_sparse_attention_vs_bruteforce():
    rng = jax.random.PRNGKey(5)
    b, l, h, d = 2, 16, 2, 4
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, l, h, d))
    k = jax.random.normal(ks[1], (b, l, h, d))
    v = jax.random.normal(ks[2], (b, l, h, d))
    valid = jnp.arange(l)[None] < jnp.array([10, 16])[:, None]
    out = sa.full_sparse_attention(q, k, v, valid, valid)
    mask = np.asarray(valid)[:, :, None] & np.asarray(valid)[:, None, :]
    expect = brute_force_masked_attention(
        np.asarray(q), np.asarray(k), np.asarray(v), mask
    )
    vm = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(out)[vm], expect[vm], atol=1e-5
    )


def test_windowed_attention_vs_bruteforce():
    rng = jax.random.PRNGKey(6)
    x = random_sparse(rng, b=2, l=64, c=8, res=16, fill=0.8)
    b, l, h, d = 2, 64, 2, 4
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, l, h, d))
    k = jax.random.normal(ks[1], (b, l, h, d))
    v = jax.random.normal(ks[2], (b, l, h, d))
    ws = 4
    out = sa.windowed_sparse_attention(q, k, v, x, window_size=ws, chunk=16)
    wid = np.asarray(sa.window_ids(x.coords, x.valid, 16, ws))
    mask = (wid[:, :, None] == wid[:, None, :]) & (wid[:, :, None] >= 0)
    expect = brute_force_masked_attention(
        np.asarray(q), np.asarray(k), np.asarray(v), mask
    )
    vm = np.asarray(x.valid)
    np.testing.assert_allclose(np.asarray(out)[vm], expect[vm], atol=1e-4)


def test_windowed_attention_shift_changes_windows():
    rng = jax.random.PRNGKey(7)
    x = random_sparse(rng, b=1, l=64, c=8, res=16, fill=1.0)
    q = jax.random.normal(rng, (1, 64, 2, 4))
    o1 = sa.windowed_sparse_attention(q, q, q, x, window_size=4, shift=(0, 0, 0))
    o2 = sa.windowed_sparse_attention(q, q, q, x, window_size=4, shift=(2, 2, 2))
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-5


def test_serialized_attention_windows_along_curve():
    rng = jax.random.PRNGKey(8)
    x = random_sparse(rng, b=1, l=64, c=8, res=16, fill=1.0)
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (1, 64, 2, 4))
    k = jax.random.normal(ks[1], (1, 64, 2, 4))
    v = jax.random.normal(ks[2], (1, 64, 2, 4))
    out = sa.serialized_sparse_attention(q, k, v, x, window_tokens=16)
    # brute force: sort by z-order code, windows of 16 tokens
    from gvfdiffusion_tpu.ops import curves

    code = np.asarray(curves.encode(x.coords[0]))
    order = np.argsort(code)
    seg = np.zeros(64, np.int32)
    seg[order] = np.arange(64) // 16
    mask = (seg[None, :, None] == seg[None, None, :])
    expect = brute_force_masked_attention(
        np.asarray(q), np.asarray(k), np.asarray(v), mask
    )
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)


def test_sparse_mha_module_modes():
    rng = jax.random.PRNGKey(9)
    x = random_sparse(rng, b=2, l=64, c=16, res=16, fill=0.75)
    for mode, kw in [
        ("full", {}),
        ("windowed", dict(window_size=4)),
        ("serialized", dict(window_size=16)),
    ]:
        mha = sa.SparseMultiHeadAttention(
            channels=16, num_heads=4, attn_mode=mode, qk_rms_norm=True, **kw
        )
        params = mha.init(jax.random.PRNGKey(10), x)
        out = mha.apply(params, x)
        assert out.feats.shape == (2, 64, 16)
        assert np.isfinite(np.asarray(out.feats)).all()
    # cross mode
    ctx = jax.random.normal(rng, (2, 12, 16))
    mha = sa.SparseMultiHeadAttention(channels=16, num_heads=4, attn_type="cross")
    params = mha.init(jax.random.PRNGKey(11), x, ctx)
    out = mha.apply(params, x, ctx)
    assert np.isfinite(np.asarray(out.feats)).all()


def test_linear_and_layernorm():
    x = random_sparse(jax.random.PRNGKey(12), b=2, l=32, c=8)
    lin = SparseLinear(features=12)
    p = lin.init(jax.random.PRNGKey(0), x)
    y = lin.apply(p, x)
    assert y.feats.shape == (2, 32, 12)
    # invalid slots stay zero
    assert np.abs(np.asarray(y.feats)[~np.asarray(y.valid)]).max() == 0.0
    ln = SparseLayerNorm()
    p = ln.init(jax.random.PRNGKey(0), x)
    z = ln.apply(p, x)
    assert np.isfinite(np.asarray(z.feats)).all()


def test_strided_conv_matches_dense():
    """SparseStridedConv3d == dense strided conv at the parent positions."""
    from gvfdiffusion_tpu.sparse.conv import SparseStridedConv3d

    x = random_sparse(jax.random.PRNGKey(0), b=2, l=64, c=4, res=16)
    mod = SparseStridedConv3d(features=6, kernel_size=3, stride=2, padding=1)
    params = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(params, x)
    assert out.resolution == 8

    dense = np.asarray(x.to_dense())  # [B, R, R, R, C]
    w = np.asarray(params["params"]["kernel"]).reshape(3, 3, 3, 4, 6)
    b = np.asarray(params["params"]["bias"])
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(w),
        window_strides=(2, 2, 2), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + b
    ref = np.asarray(ref)
    oc = np.asarray(out.coords)
    ov = np.asarray(out.valid)
    of = np.asarray(out.feats)
    for bi in range(2):
        for li in range(out.capacity):
            if ov[bi, li]:
                expect = ref[bi, oc[bi, li, 0], oc[bi, li, 1], oc[bi, li, 2]]
                np.testing.assert_allclose(of[bi, li], expect, atol=1e-4)


def test_inverse_conv_matches_dense_scatter():
    """SparseInverseConv3d == manual dense transposed-conv scatter at the
    target (pre-stride) positions."""
    from gvfdiffusion_tpu.sparse.conv import SparseInverseConv3d
    from gvfdiffusion_tpu.sparse.ops import sparse_downsample

    x = random_sparse(jax.random.PRNGKey(2), b=2, l=64, c=4, res=16)
    y = sparse_downsample(x, 2).parents  # low-res features + structure
    mod = SparseInverseConv3d(features=5, kernel_size=3, stride=2, padding=1)
    params = mod.init(jax.random.PRNGKey(3), y, x)
    out = mod.apply(params, y, x)
    assert out.resolution == 16

    # manual scatter: dense_out[o*s + kof - pad] += W[kof] . y[o]
    w = np.asarray(params["params"]["kernel"]).reshape(3, 3, 3, 4, 5)
    bias = np.asarray(params["params"]["bias"])
    dense_out = np.zeros((2, 16, 16, 16, 5), np.float32)
    yc, yv, yf = np.asarray(y.coords), np.asarray(y.valid), np.asarray(y.feats)
    for bi in range(2):
        for li in range(y.capacity):
            if not yv[bi, li]:
                continue
            o = yc[bi, li]
            for i in range(3):
                for j in range(3):
                    for l3 in range(3):
                        t = o * 2 + np.array([i, j, l3]) - 1
                        if (t >= 0).all() and (t < 16).all():
                            dense_out[bi, t[0], t[1], t[2]] += yf[bi, li] @ w[i, j, l3]
    oc, ov, of = np.asarray(out.coords), np.asarray(out.valid), np.asarray(out.feats)
    for bi in range(2):
        for li in range(out.capacity):
            if ov[bi, li]:
                expect = dense_out[bi, oc[bi, li, 0], oc[bi, li, 1], oc[bi, li, 2]] + bias
                np.testing.assert_allclose(of[bi, li], expect, atol=1e-4)


def test_strided_inverse_structure_roundtrip():
    """down (strided conv) then up (inverse conv) restores the exact original
    structure — the contract the reference's permutation cache guarantees
    (sparse/conv/conv_spconv.py:24-74)."""
    from gvfdiffusion_tpu.sparse.conv import SparseInverseConv3d, SparseStridedConv3d

    x = random_sparse(jax.random.PRNGKey(4), b=2, l=48, c=4, res=16)
    down = SparseStridedConv3d(features=8)
    up = SparseInverseConv3d(features=4)
    pd = down.init(jax.random.PRNGKey(5), x)
    y = down.apply(pd, x)
    pu = up.init(jax.random.PRNGKey(6), y, x)
    z = up.apply(pu, y, x)
    np.testing.assert_array_equal(np.asarray(z.coords), np.asarray(x.coords))
    np.testing.assert_array_equal(np.asarray(z.valid), np.asarray(x.valid))
    assert z.channels == 4 and z.resolution == x.resolution


def test_compact_scatter_roundtrip():
    from gvfdiffusion_tpu.sparse.ops import sparse_compact, sparse_scatter_back

    x = random_sparse(jax.random.PRNGKey(7), b=2, l=64, c=4, res=16, fill=0.4)
    # bound every sample's valid count under the compaction capacity
    x = x.replace(valid=x.valid & (jnp.arange(64)[None, :] < 30))
    x = x.replace(feats=x.feats * x.valid[..., None])
    y, slots = sparse_compact(x, 32)
    assert y.capacity == 32
    assert int(y.valid.sum()) == int(x.valid.sum())
    z = sparse_scatter_back(y, slots, x)
    np.testing.assert_allclose(np.asarray(z.feats), np.asarray(x.feats), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(z.valid), np.asarray(x.valid))


@pytest.mark.slow
def test_slat_flow_compacted_torso_matches():
    """SLat flow with torso compaction == without (same params, same input)."""
    from gvfdiffusion_tpu.models.trellis.slat_flow import SLatFlowModel

    x = random_sparse(jax.random.PRNGKey(8), b=1, l=32, c=4, res=16, fill=0.6)
    t = jnp.array([3.0])
    cond = jax.random.normal(jax.random.PRNGKey(9), (1, 5, 16))
    kw = dict(resolution=16, in_channels=4, model_channels=16, cond_channels=16,
              out_channels=4, num_blocks=1, num_heads=2, io_block_channels=(8,),
              num_io_res_blocks=2)
    base = SLatFlowModel(**kw)
    params = base.init(jax.random.PRNGKey(10), x, t, cond)
    ref = base.apply(params, x, t, cond)
    compacted = SLatFlowModel(torso_capacity=16, **kw)
    out = compacted.apply(params, x, t, cond)
    np.testing.assert_allclose(
        np.asarray(out.feats), np.asarray(ref.feats), atol=2e-5
    )


def test_flash_full_attention_matches_masked_path():
    """The streaming flash kernel (TPU pallas, run here in interpret mode)
    must agree with the masked XLA path on valid rows — including ragged
    validity and non-block-multiple lengths."""
    from jax.experimental.pallas import tpu as pltpu

    rng = jax.random.PRNGKey(11)
    b, lq, lk, h, d = 2, 130, 70, 2, 32
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, lq, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, h, d), jnp.float32)
    q_valid = jnp.arange(lq)[None] < jnp.array([100, lq])[:, None]
    kv_valid = jnp.arange(lk)[None] < jnp.array([37, lk])[:, None]

    expect = sa.full_sparse_attention(q, k, v, q_valid, kv_valid)
    try:
        sa._FORCE_FLASH = True
        with pltpu.force_tpu_interpret_mode():
            got = sa.full_sparse_attention(q, k, v, q_valid, kv_valid)
    finally:
        sa._FORCE_FLASH = None
    vm = np.asarray(q_valid)
    np.testing.assert_allclose(
        np.asarray(got)[vm], np.asarray(expect)[vm], atol=2e-5
    )


def test_fused_upsample_conv_matches_conv_of_upsample():
    """SparseConv3d(child, parent=p, c2p=...) (project-then-gather, used by
    the SLat-flow up-blocks) == SparseConv3d(sparse_upsample(p, child, c2p))
    with the SAME kernel/bias — the fusion is exact algebra, not an
    approximation."""
    parent_full = random_sparse(jax.random.PRNGKey(7), b=2, l=48, c=6, res=8)
    child = sparse_subdivide(parent_full)  # every child duplicates its parent
    # rebuild the child->parent map the way the model carries it
    from gvfdiffusion_tpu.sparse.ops import sparse_downsample

    res = sparse_downsample(child, 2)
    parent, c2p = res.parents, res.child_to_parent

    mod = SparseConv3d(features=5, kernel_size=3)
    params = mod.init(jax.random.PRNGKey(8), parent, parent=parent, c2p=c2p)

    fused = mod.apply(params, child, parent=parent, c2p=c2p)
    ref = mod.apply(params, sparse_upsample(parent, child, c2p))

    cv = np.asarray(child.valid)
    np.testing.assert_allclose(
        np.asarray(fused.feats)[cv], np.asarray(ref.feats)[cv],
        rtol=1e-5, atol=1e-5,
    )
