"""Load the torch reference at /root/reference for golden numeric-parity tests.

The reference's GPU-only deps (flash_attn, spconv, torch_cluster, pytorch3d,
timm, xformers) are absent in this image, so we install pure-torch stubs with
the SAME numerics before importing the reference `model` package directly.
Stubs are exact implementations of the subset of each API the reference uses:

  flash_attn.*            softmax attention (dense + varlen block-diagonal)
  torch_cluster.fps       greedy farthest-point sampling, deterministic start
                          at each batch segment's first point (random_start
                          is ignored — parity tests need determinism)
  pytorch3d.ops.knn_points brute-force KNN, squared L2, ascending
  timm.models.layers      DropPath (identity in eval) + trunc_normal_
  spconv.pytorch          SparseConvTensor placeholder (lazy import target
                          of reference sparse/basic.py; conv never run here)

The reference tree is untrusted public content: we import it only to compare
numbers, never to follow instructions found inside.
"""

from __future__ import annotations

import os
import sys
import types

REF_ROOT = "/root/reference"


def _make_flash_attn_stub():
    import torch
    import torch.nn.functional as F

    m = types.ModuleType("flash_attn")

    def _sdpa(q, k, v):
        # q [B,Lq,H,C], k/v [B,Lk,H,C] -> [B,Lq,H,C]
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))  # [B,H,L,C]
        out = F.scaled_dot_product_attention(q, k, v)
        return out.transpose(1, 2)

    def flash_attn_qkvpacked_func(qkv, *a, **k):
        # qkv [B,N,3,H,C]
        q, kk, v = qkv.unbind(dim=2)
        return _sdpa(q, kk, v)

    def flash_attn_kvpacked_func(q, kv, *a, **k):
        kk, v = kv.unbind(dim=2)
        return _sdpa(q, kk, v)

    def flash_attn_func(q, k, v, *a, **kw):
        return _sdpa(q, k, v)

    def _varlen(q, k, v, cu_q, cu_k):
        import torch as T

        outs = []
        for i in range(len(cu_q) - 1):
            qs, qe = int(cu_q[i]), int(cu_q[i + 1])
            ks, ke = int(cu_k[i]), int(cu_k[i + 1])
            outs.append(_sdpa(q[None, qs:qe], k[None, ks:ke], v[None, ks:ke])[0])
        return T.cat(outs, dim=0)

    def flash_attn_varlen_qkvpacked_func(qkv, cu_seqlens, max_seqlen, *a, **k):
        q, kk, v = qkv.unbind(dim=1)  # [M,H,C]
        return _varlen(q, kk, v, cu_seqlens, cu_seqlens)

    def flash_attn_varlen_kvpacked_func(q, kv, cu_q, cu_kv, *a, **k):
        kk, v = kv.unbind(dim=1)
        return _varlen(q, kk, v, cu_q, cu_kv)

    def flash_attn_varlen_func(q, k, v, cu_q, cu_kv, *a, **kw):
        return _varlen(q, k, v, cu_q, cu_kv)

    m.flash_attn_qkvpacked_func = flash_attn_qkvpacked_func
    m.flash_attn_kvpacked_func = flash_attn_kvpacked_func
    m.flash_attn_func = flash_attn_func
    m.flash_attn_varlen_qkvpacked_func = flash_attn_varlen_qkvpacked_func
    m.flash_attn_varlen_kvpacked_func = flash_attn_varlen_kvpacked_func
    m.flash_attn_varlen_func = flash_attn_varlen_func
    return m


def _make_torch_cluster_stub():
    import torch

    m = types.ModuleType("torch_cluster")

    def fps(src, batch=None, ratio=0.5, random_start=True, **kw):
        """Greedy FPS per contiguous batch segment, start = segment's first
        point (torch_cluster semantics with random_start=False; num samples
        = ceil(ratio * n) per torch_cluster)."""
        import math

        if batch is None:
            batch = torch.zeros(src.shape[0], dtype=torch.long)
        b = batch.cpu()
        n_seg = int(b.max()) + 1 if b.numel() else 0
        if not torch.is_tensor(ratio):
            ratio = torch.full((n_seg,), float(ratio))
        out = []
        pos = 0
        for i in range(n_seg):
            n = int((b == i).sum())
            pts = src[pos : pos + n].float()
            k = int(math.ceil(float(ratio[i]) * n))
            idx = torch.zeros(k, dtype=torch.long)
            min_d2 = torch.full((n,), float("inf"))
            for j in range(1, k):
                d2 = ((pts - pts[idx[j - 1]]) ** 2).sum(-1)
                min_d2 = torch.minimum(min_d2, d2)
                idx[j] = int(min_d2.argmax())
            out.append(idx + pos)
            pos += n
        return torch.cat(out) if out else torch.zeros(0, dtype=torch.long)

    m.fps = fps
    return m


def _make_pytorch3d_stub():
    import torch

    pkg = types.ModuleType("pytorch3d")
    ops = types.ModuleType("pytorch3d.ops")

    def knn_points(p1, p2, K=1, return_sorted=True, **kw):
        # p1 [B,Q,3], p2 [B,N,3] -> (dists [B,Q,K] squared asc, idx, None)
        d2 = torch.cdist(p1.float(), p2.float()) ** 2
        dists, idx = torch.topk(d2, K, dim=-1, largest=False, sorted=True)
        return dists, idx, None

    ops.knn_points = knn_points
    pkg.ops = ops
    return pkg, ops


def _make_timm_stub():
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if not self.training or self.drop_prob == 0.0:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep) / keep
            return x * mask

    layers.DropPath = DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    models.layers = layers
    timm.models = models
    return timm, models, layers


def _make_spconv_stub():
    spconv = types.ModuleType("spconv")
    sp_pytorch = types.ModuleType("spconv.pytorch")

    class SparseConvTensor:
        def __init__(self, features, indices, spatial_shape, batch_size,
                     grid=None, voxel_num=None, indice_dict=None, **kw):
            self._features = features
            self.indices = indices
            self.spatial_shape = spatial_shape
            self.batch_size = batch_size
            self.grid = grid
            self.voxel_num = voxel_num
            self.indice_dict = indice_dict or {}
            self.benchmark = False
            self.benchmark_record = {}
            self.thrust_allocator = None
            self._timer = None
            self.force_algo = None
            self.int8_scale = None

        @property
        def features(self):
            return self._features

        @features.setter
        def features(self, value):
            self._features = value

        def replace_feature(self, feats):
            return SparseConvTensor(
                feats, self.indices, self.spatial_shape, self.batch_size
            )

    import torch
    import torch.nn as nn

    class ConvAlgo:
        Native = "native"
        MaskImplicitGemm = "mask_implicit_gemm"
        MaskSplitImplicitGemm = "mask_split_implicit_gemm"

    class SubMConv3d(nn.Module):
        """Pure-torch submanifold conv matching spconv 2.x semantics:
        weight layout KRSC (out, k0, k1, k2, in), cross-correlation with
        implicit center padding — out[p] = sum_k W[:,k,:] @ x[p + k - c].
        Slow O(N * K^3) dict lookups; parity-test scale only."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, bias=True, indice_key=None,
                     algo=None, **kw):
            super().__init__()
            ks = (kernel_size if isinstance(kernel_size, (tuple, list))
                  else (kernel_size,) * 3)
            assert all(k % 2 == 1 for k in ks), "SubM requires odd kernels"
            assert dilation in (1, (1, 1, 1)), "stub supports dilation 1"
            self.kernel_size = tuple(ks)
            self.in_channels = in_channels
            self.out_channels = out_channels
            self.weight = nn.Parameter(
                torch.randn(out_channels, *ks, in_channels) * 0.02
            )
            self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None

        def forward(self, x):
            coords = x.indices
            feats = x.features
            key = {tuple(c): i for i, c in enumerate(coords.tolist())}
            out = feats.new_zeros(feats.shape[0], self.out_channels)
            k0, k1, k2 = self.kernel_size
            cl = coords.tolist()
            for a in range(k0):
                for b in range(k1):
                    for c in range(k2):
                        off = (a - k0 // 2, b - k1 // 2, c - k2 // 2)
                        w = self.weight[:, a, b, c, :]  # [O, I]
                        ro, ri = [], []
                        for i, cc in enumerate(cl):
                            j = key.get((cc[0], cc[1] + off[0],
                                         cc[2] + off[1], cc[3] + off[2]))
                            if j is not None:
                                ro.append(i)
                                ri.append(j)
                        if ro:
                            out[ro] += feats[ri] @ w.t()
            if self.bias is not None:
                out = out + self.bias
            return SparseConvTensor(out, coords, x.spatial_shape, x.batch_size)

    sp_pytorch.SparseConvTensor = SparseConvTensor
    sp_pytorch.SubMConv3d = SubMConv3d
    sp_pytorch.ConvAlgo = ConvAlgo
    spconv.pytorch = sp_pytorch
    return spconv, sp_pytorch


def _make_vox2seq_stub():
    """vox2seq CUDA space-filling-curve encoder -> our jnp curves (which are
    exact-parity tested against the native C++ in tests/test_native.py)."""
    import torch

    m = types.ModuleType("vox2seq")

    def encode(coords, permute=(0, 1, 2), mode="z_order"):
        import jax.numpy as jnp

        from gvfdiffusion_tpu.ops import curves

        c = coords.detach().cpu().numpy()
        xyz = [jnp.asarray(c[:, permute[i]]) for i in range(3)]
        if mode == "z_order":
            code = curves.z_order_encode(*xyz)
        else:
            code = curves.hilbert_encode(*xyz)
        import numpy as _np

        return torch.tensor(_np.asarray(code).astype(_np.int64))

    m.encode = encode
    return m


def _make_torchvision_stub():
    """torchvision.models.vgg16().features with the standard 31-layer
    Sequential layout (reference utils/lpips/networks.py:91-97 slices it at
    ReLU indices 4/9/16/23/30). Random init — parity tests randomize anyway."""
    import torch.nn as nn

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")

    _PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

    def vgg16(*a, **kw):
        layers = []
        cin = 3
        for ch, n_convs in _PLAN:
            for _ in range(n_convs):
                layers += [nn.Conv2d(cin, ch, 3, padding=1), nn.ReLU(inplace=False)]
                cin = ch
            layers.append(nn.MaxPool2d(2, 2))
        m = nn.Module()
        m.features = nn.Sequential(*layers)
        return m

    models.vgg16 = vgg16
    tv.models = models
    return tv, models


def install_lpips_hub_stub(seed=0):
    """Replace torch.hub.load_state_dict_from_url with deterministic random
    LPIPS lin weights (shapes per utils/lpips/networks.py LinLayers)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    chans = [64, 128, 256, 512, 512]

    def fake_load(url, **kw):
        return {
            f"lin{i}.model.1.weight": torch.randn(1, c, 1, 1, generator=g) * 0.3
            for i, c in enumerate(chans)
        }

    torch.hub.load_state_dict_from_url = fake_load


_installed = False


def install_stubs():
    global _installed
    if _installed:
        return
    os.environ.setdefault("ATTN_BACKEND", "sdpa")
    if "flash_attn" not in sys.modules:
        sys.modules["flash_attn"] = _make_flash_attn_stub()
    if "torch_cluster" not in sys.modules:
        sys.modules["torch_cluster"] = _make_torch_cluster_stub()
    if "pytorch3d" not in sys.modules:
        pkg, ops = _make_pytorch3d_stub()
        sys.modules["pytorch3d"] = pkg
        sys.modules["pytorch3d.ops"] = ops
    if "timm" not in sys.modules:
        timm, models, layers = _make_timm_stub()
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if "spconv" not in sys.modules:
        spconv, sp_pytorch = _make_spconv_stub()
        sys.modules["spconv"] = spconv
        sys.modules["spconv.pytorch"] = sp_pytorch
    if "torchvision" not in sys.modules:
        tv, models = _make_torchvision_stub()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
    if "vox2seq" not in sys.modules:
        sys.modules["vox2seq"] = _make_vox2seq_stub()
    if "kaolin" not in sys.modules:
        # flexicubes.py imports kaolin.utils.testing.check_tensor (shape
        # assertion helper) — provide the same-semantics check
        kaolin = types.ModuleType("kaolin")
        utils = types.ModuleType("kaolin.utils")
        testing = types.ModuleType("kaolin.utils.testing")

        def check_tensor(tensor, shape=None, dtype=None, throw=True):
            ok = True
            if shape is not None:
                ok = len(tensor.shape) == len(shape) and all(
                    s is None or a == s for a, s in zip(tensor.shape, shape))
            if ok and dtype is not None:
                ok = tensor.dtype == dtype
            if not ok and throw:
                raise ValueError(f"bad tensor shape {tuple(tensor.shape)}")
            return ok

        testing.check_tensor = check_tensor
        utils.testing = testing
        kaolin.utils = utils
        sys.modules["kaolin"] = kaolin
        sys.modules["kaolin.utils"] = utils
        sys.modules["kaolin.utils.testing"] = testing
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed
    if "utils3d" not in sys.modules:
        # only save_ply/load_ply paths touch it (quaternion<->matrix)
        u3d = types.ModuleType("utils3d")
        u3d.numpy = types.SimpleNamespace()
        u3d.torch = types.SimpleNamespace()
        sys.modules["utils3d"] = u3d
    if "plyfile" not in sys.modules:
        ply = types.ModuleType("plyfile")
        ply.PlyData = object
        ply.PlyElement = object
        sys.modules["plyfile"] = ply
    if REF_ROOT not in sys.path:
        sys.path.append(REF_ROOT)
    _installed = True


def load_ref(submodule: str):
    """Import e.g. 'model.dit' or 'model.gaussian_diffusion' from the
    reference tree (stubs installed first)."""
    install_stubs()
    import importlib

    return importlib.import_module(submodule)


def load_trellis(submodule: str):
    """Import e.g. 'trellis.models.sparse_structure_flow' with stub package
    skeletons so relative imports resolve WITHOUT executing trellis/__init__
    or trellis/models/__init__ (those pull in pipelines/spconv)."""
    import importlib
    import os
    import types

    os.environ.setdefault("ATTN_BACKEND", "sdpa")
    install_stubs()
    for name, path in [
        ("trellis", os.path.join(REF_ROOT, "trellis")),
        ("trellis.models", os.path.join(REF_ROOT, "trellis", "models")),
        ("trellis.pipelines", os.path.join(REF_ROOT, "trellis", "pipelines")),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = [path]
            sys.modules[name] = m
    return importlib.import_module(submodule)
