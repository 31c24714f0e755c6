"""Numerical parity of the CLIP ModifiedResNet tower against torch.

The reference's `PretrainedSSL(model="clip_rn50")` keeps
`clip.load("RN50").visual` — CLIP's modified ResNet (3-conv stem, avg-pool
anti-aliased downsampling, AttentionPool2d readout; out_dim asserted 1024,
architectures.py:339-376). Like `tests/test_clip_torch_parity.py`, a
torch-side module with the same semantics and RANDOM weights (including
randomized BatchNorm running statistics) generates fixtures on the fly; the
converted flax tower must reproduce the embeddings in fp32 to tight
tolerance. A transposed kernel / missed bias / wrong stat mapping breaks
these at ~1e-1, far above the thresholds.
"""

from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

WIDTH, LAYERS, HEADS, OUT, IMG = 16, (1, 1, 1, 1), 4, 8, 64


class TorchBottleneck(torch.nn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, padding=1,
                                     bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.avgpool = (torch.nn.AvgPool2d(stride) if stride > 1
                        else torch.nn.Identity())
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = torch.nn.Sequential(OrderedDict([
                ("-1", torch.nn.AvgPool2d(stride) if stride > 1
                 else torch.nn.Identity()),
                ("0", torch.nn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                ("1", torch.nn.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        identity = x if self.downsample is None else self.downsample(x)
        return F.relu(out + identity)


class TorchAttentionPool2d(torch.nn.Module):
    def __init__(self, n_tokens, embed_dim, heads, out_dim):
        super().__init__()
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(n_tokens, embed_dim) * embed_dim ** -0.5)
        self.q_proj = torch.nn.Linear(embed_dim, embed_dim)
        self.k_proj = torch.nn.Linear(embed_dim, embed_dim)
        self.v_proj = torch.nn.Linear(embed_dim, embed_dim)
        self.c_proj = torch.nn.Linear(embed_dim, out_dim)
        self.num_heads = heads

    def forward(self, x):  # (B, C, H, W)
        x = x.flatten(start_dim=2).permute(2, 0, 1)       # (HW, B, C)
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        out, _ = F.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
            in_proj_weight=None,
            in_proj_bias=torch.cat([self.q_proj.bias, self.k_proj.bias,
                                    self.v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            training=False, need_weights=False)
        return out.squeeze(0)                              # (B, out_dim)


class TorchModifiedResNet(torch.nn.Module):
    """CLIP's ModifiedResNet semantics, written against the public
    architecture description (3-conv stem + avgpool, stride-1 convs with
    avg-pool downsampling, attention-pool readout)."""

    def __init__(self, layers=LAYERS, width=WIDTH, heads=HEADS,
                 out_dim=OUT, image_size=IMG):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, width // 2, 3, stride=2, padding=1,
                                     bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width // 2)
        self.conv2 = torch.nn.Conv2d(width // 2, width // 2, 3, padding=1,
                                     bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width // 2)
        self.conv3 = torch.nn.Conv2d(width // 2, width, 3, padding=1,
                                     bias=False)
        self.bn3 = torch.nn.BatchNorm2d(width)
        self.avgpool = torch.nn.AvgPool2d(2)
        inplanes = width
        for i, n_blocks in enumerate(layers):
            planes = width * 2 ** i
            blocks = []
            for j in range(n_blocks):
                stride = 2 if i > 0 and j == 0 else 1
                blocks.append(TorchBottleneck(inplanes, planes, stride))
                inplanes = planes * 4
            setattr(self, f"layer{i + 1}", torch.nn.Sequential(*blocks))
        spatial = image_size // 4 // 2 ** (len(layers) - 1)
        self.attnpool = TorchAttentionPool2d(spatial ** 2 + 1, inplanes,
                                             heads, out_dim)
        self.n_layers = len(layers)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for i in range(self.n_layers):
            x = getattr(self, f"layer{i + 1}")(x)
        return self.attnpool(x)


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for name, buf in model.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=g) * 0.05)
        elif name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)


@pytest.mark.parametrize("prefix", ["", "visual."])
def test_converted_clip_resnet_matches_torch(prefix):
    from lossyless_tpu.nn.clip_resnet import ClipResNet, convert_clip_resnet

    torch.manual_seed(0)
    ref = TorchModifiedResNet().eval()
    _randomize_bn_stats(ref)
    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        want = ref(x).numpy()

    sd = {prefix + k: v for k, v in ref.state_dict().items()}
    if prefix:  # a full CLIP dict carries other towers too: must be ignored
        sd["logit_scale"] = torch.zeros(())
        sd["transformer.resblocks.0.ln_1.weight"] = torch.ones(4)
    params, stats = convert_clip_resnet(sd)
    tower = ClipResNet(out_dim=OUT, layers=LAYERS, width=WIDTH, heads=HEADS,
                       dtype="float32", attn_impl="einsum")
    got = np.asarray(tower.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_clip_resnet_param_tree_matches_converter():
    """Random init produces exactly the converter's tree (shape-checked),
    so `encoder.pretrained_path` injection composes with frozen towers."""
    import jax

    from lossyless_tpu.nn.clip_resnet import ClipResNet, convert_clip_resnet

    torch.manual_seed(1)
    ref = TorchModifiedResNet()
    params, stats = convert_clip_resnet(ref.state_dict())
    tower = ClipResNet(out_dim=OUT, layers=LAYERS, width=WIDTH, heads=HEADS,
                       dtype="float32", attn_impl="einsum")
    v = tower.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
    for name, init_tree, conv_tree in (("params", v["params"], params),
                                       ("batch_stats", v["batch_stats"],
                                        stats)):
        a = jax.tree.map(np.shape, init_tree)
        b = jax.tree.map(np.shape, conv_tree)
        assert a == b, f"{name} tree mismatch"


def test_registry_dispatches_clip_rn50():
    import jax

    from lossyless_tpu.nn.clip_resnet import ClipResNet
    from lossyless_tpu.nn.registry import get_architecture

    m = get_architecture("clip_rn50", (64, 64, 3), 1024, width=16, heads=4,
                         layers=(1, 1, 1, 1))
    assert isinstance(m, ClipResNet)
    v = m.init(jax.random.key(0), jnp.zeros((2, 64, 64, 3)))
    z = m.apply(v, jnp.zeros((2, 64, 64, 3)))
    assert z.shape == (2, 1024)


def test_positional_embedding_resampled_across_resolutions():
    """A 224px-published pe grid loads into a smaller-resolution tower by
    bicubic resampling of the spatial part (lead token kept verbatim)."""
    from lossyless_tpu.nn.pretrained import _adapt_positional_embeddings

    C = 8
    g_src, g_dst = 7, 3
    rng = np.random.default_rng(0)
    pe = rng.normal(0, 1, (g_src * g_src + 1, C)).astype(np.float32)
    init = {"attnpool": {"positional_embedding":
                         np.zeros((g_dst * g_dst + 1, C), np.float32)}}
    loaded = {"attnpool": {"positional_embedding": pe}}
    out = _adapt_positional_embeddings(init, loaded)
    got = out["attnpool"]["positional_embedding"]
    assert got.shape == (g_dst * g_dst + 1, C)
    np.testing.assert_array_equal(got[0], pe[0])  # lead token untouched
    # a non-square token count falls through untouched (shape check errors)
    bad = {"attnpool": {"positional_embedding": pe[:4]}}
    assert _adapt_positional_embeddings(init, bad) is bad


def test_attn_pool_vmem_block_limit():
    """Wide fp32 kv blocks scale the Pallas grid block down to budget."""
    from lossyless_tpu.nn.flash_attn import _vmem_block_limit

    # ViT bf16 qkv: 50 tokens x 2304 x 2B ~ 230KB/img -> full 16 block
    assert _vmem_block_limit(50 * 2304 * 2) == 16
    # RN50 attention pool fp32 kv: 50 x 4096 x 4B ~ 819KB/img -> 5
    assert _vmem_block_limit(50 * 4096 * 4) == 5
    assert _vmem_block_limit(10 << 20) == 1  # never zero
