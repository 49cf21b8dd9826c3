"""Torch-parity tests: our fusion cells and converter rules must reproduce
torch module outputs exactly (the foundation of .pt checkpoint fidelity,
SURVEY.md 5.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from temporal_latticenet_tpu.models.fusion import _GRUCell, _LSTMCell, TorchLinear
from temporal_latticenet_tpu.train import torch_convert as tc


def test_gru_cell_matches_torch(rng):
    h = 16
    cell_t = torch.nn.GRUCell(h, h)
    x = rng.normal(size=(5, h)).astype(np.float32)
    hh = rng.normal(size=(5, h)).astype(np.float32)
    want = cell_t(torch.tensor(x), torch.tensor(hh)).detach().numpy()

    sd = {f"m.{k}": v.detach().numpy() for k, v in cell_t.state_dict().items()}
    params = tc.convert_gru_cell(sd, "m")
    cell_j = _GRUCell(h)
    got = cell_j.apply({"params": params}, jnp.asarray(x), jnp.asarray(hh))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_lstm_cell_matches_torch(rng):
    h = 12
    cell_t = torch.nn.LSTMCell(h, h)
    x = rng.normal(size=(4, h)).astype(np.float32)
    hh = rng.normal(size=(4, h)).astype(np.float32)
    cc = np.zeros((4, h), np.float32)  # the reference always feeds zero cell state
    want_h, want_c = cell_t(torch.tensor(x), (torch.tensor(hh), torch.tensor(cc)))

    sd = {f"m.{k}": v.detach().numpy() for k, v in cell_t.state_dict().items()}
    params = tc.convert_lstm_cell(sd, "m")
    got_h, got_c = _LSTMCell(h).apply({"params": params}, jnp.asarray(x),
                                      jnp.asarray(hh), jnp.asarray(cc))
    np.testing.assert_allclose(np.asarray(got_h), want_h.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), want_c.detach().numpy(), atol=1e-5)


def test_linear_matches_torch(rng):
    lin_t = torch.nn.Linear(10, 7)
    x = rng.normal(size=(3, 10)).astype(np.float32)
    want = lin_t(torch.tensor(x)).detach().numpy()
    sd = {f"l.{k}": v.detach().numpy() for k, v in lin_t.state_dict().items()}
    params = tc.convert_linear(sd, "l")
    got = TorchLinear(7).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_groupnorm_matches_torch(rng):
    """MaskedGroupNorm on a fully-valid table must equal torch GroupNorm on
    the (1, C, V) layout the reference uses."""
    from temporal_latticenet_tpu.models.blocks import MaskedGroupNorm, gn_num_groups
    c, v = 64, 33
    gn_t = torch.nn.GroupNorm(gn_num_groups(c), c, affine=True)
    with torch.no_grad():
        gn_t.weight.uniform_(0.5, 1.5)
        gn_t.bias.uniform_(-0.5, 0.5)
    x = rng.normal(size=(v, c)).astype(np.float32)
    want = gn_t(torch.tensor(x).unsqueeze(0).transpose(1, 2)) \
        .transpose(1, 2).squeeze(0).detach().numpy()

    params = tc.convert_groupnorm(
        {"g.gn.weight": gn_t.weight.detach().numpy(),
         "g.gn.bias": gn_t.bias.detach().numpy()}, "g.gn")
    # pad to capacity with an invalid row 0 + tail; stats must ignore them
    cap = 64
    xp = np.zeros((cap, c), np.float32)
    xp[1:v + 1] = x
    got = MaskedGroupNorm(c).apply({"params": params}, jnp.asarray(xp),
                                   jnp.int32(v + 1))
    np.testing.assert_allclose(np.asarray(got)[1:v + 1], want, atol=2e-4)


def test_full_state_dict_conversion_schema(rng):
    """Build a synthetic reference-schema state_dict for the flagship config
    and check every target param of our model gets filled with the right
    shape."""
    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.models import LNNSeq, init_state

    cfg = ModelConfig(nr_classes=6, pointnet_layers=(8, 16),
                      pointnet_start_nr_channels=16,
                      nr_blocks_down_stage=(1, 1, 1), nr_blocks_bottleneck=1,
                      nr_blocks_up_stage=(1, 1, 1),
                      rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=2)
    rt = RuntimeConfig(max_points=32, capacity_level0=256, capacity_decay=1.0,
                       min_capacity=128, sigma=0.6)
    model = LNNSeq(cfg, rt)
    k = jax.random.PRNGKey(0)
    pos = jnp.zeros((32, 3)); val = jnp.zeros((32, 1)); msk = jnp.ones((32,), bool)
    variables = model.init(k, pos, val, msk, init_state(cfg, rt), final=True)
    target = variables["params"]

    # synthesise a torch-side state_dict with reference names and torch layouts
    sd = {}

    def put_linear(prefix, kernel_shape):
        sd[prefix + ".weight"] = rng.normal(size=kernel_shape[::-1]).astype(np.float32)
        sd[prefix + ".bias"] = rng.normal(size=(kernel_shape[1],)).astype(np.float32)

    def put_from_tree(prefix, tree):
        for name, leaf in tree.items():
            if isinstance(leaf, dict):
                put_from_tree(prefix + "." + name, leaf)

    # walk our param tree and emit the torch twin key for each leaf
    def emit(prefix_map, target):
        pass

    # simpler: construct sd directly per converter expectations
    for i, w in enumerate(cfg.pointnet_layers):
        fan_in = (4 if i == 0 else cfg.pointnet_layers[i - 1])
        put_linear(f"point_net_seq.layers.{i}", (fan_in, w))
    sd["point_net_seq.last_conv.weight"] = rng.normal(
        size=(9 * cfg.early_channels, cfg.pointnet_start_nr_channels)).astype(np.float32)
    # early GRU
    h = cfg.early_channels
    for nm, shape in [("weight_ih", (3 * h, h)), ("weight_hh", (3 * h, h)),
                      ("bias_ih", (3 * h,)), ("bias_hh", (3 * h,))]:
        sd[f"point_net_seq.fusion_module.GRU.{nm}"] = rng.normal(size=shape).astype(np.float32)
    put_linear("point_net_seq.fusion_module.hidden_linear", (h, h))

    for slot, ch in [(0, cfg.middle_channels), (2, cfg.late_channels)]:
        pre = f"recurrent_fusion_modules.{slot}"
        for nm, shape in [("weight_ih", (3 * ch, ch)), ("weight_hh", (3 * ch, ch)),
                          ("bias_ih", (3 * ch,)), ("bias_hh", (3 * ch,))]:
            sd[f"{pre}.GRU.{nm}"] = rng.normal(size=shape).astype(np.float32)
        put_linear(f"{pre}.hidden_linear", (ch, ch))
    # bottleneck aflow
    ch = cfg.bottleneck_channels
    sd["recurrent_fusion_modules.1.AFLOW.alpha"] = np.float32(0.1)
    sd["recurrent_fusion_modules.1.AFLOW.beta"] = np.float32(0.1)
    sd["recurrent_fusion_modules.1.AFLOW.weight"] = rng.normal(size=(9 * ch, ch)).astype(np.float32)
    sd["recurrent_fusion_modules.1.AFLOW.bias"] = rng.normal(size=(ch,)).astype(np.float32)
    put_linear("recurrent_fusion_modules.1.linear", (2 * ch, ch))

    def put_gn(prefix, c):
        sd[prefix + ".gn.gn.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[prefix + ".gn.gn.bias"] = rng.normal(size=(c,)).astype(np.float32)

    def put_conv(prefix, cin, cout, bias=False):
        sd[prefix + ".conv.weight"] = rng.normal(size=(9 * cin, cout)).astype(np.float32)
        if bias:
            sd[prefix + ".conv.bias"] = rng.normal(size=(cout,)).astype(np.float32)

    def put_resnet(prefix, c, last_bias=False):
        put_gn(prefix + ".conv1", c); put_conv(prefix + ".conv1", c, c)
        put_gn(prefix + ".conv2", c); put_conv(prefix + ".conv2", c, c,
                                               bias=last_bias)

    def put_bottleneck(prefix, c):
        put_gn(prefix + ".contract", c)
        sd[prefix + ".contract.conv.weight"] = rng.normal(size=(c // 2, c)).astype(np.float32)
        put_gn(prefix + ".conv", c // 2); put_conv(prefix + ".conv", c // 2, c // 2)
        put_gn(prefix + ".expand", c // 2)
        sd[prefix + ".expand.conv.weight"] = rng.normal(size=(c, c // 2)).astype(np.float32)

    c = cfg.pointnet_start_nr_channels
    put_resnet("resnet_blocks_per_down_lvl_list.0.0", c)
    put_gn("coarsens_list.0", c); put_conv("coarsens_list.0", c, 2 * c)
    put_resnet("resnet_blocks_per_down_lvl_list.1.0", 2 * c)
    put_gn("coarsens_list.1", 2 * c); put_conv("coarsens_list.1", 2 * c, 4 * c)
    put_bottleneck("resnet_blocks_bottleneck.0", 4 * c)
    put_gn("finefy_list.0", 4 * c); put_conv("finefy_list.0", 4 * c, 2 * c)
    put_gn("finefy_list.1", 4 * c); put_conv("finefy_list.1", 4 * c, 2 * c)
    put_resnet("resnet_blocks_per_up_lvl_list.1.0", cfg.late_channels,
               last_bias=True)

    params, report = tc.convert_state_dict(sd, cfg)
    got = params["params"]

    # compare shapes against the real target tree (slice is synthesised by
    # the external CUDA module, so it is exempt here)
    def walk(a, b, path=""):
        for k, v in a.items():
            if k == "slice_fast_cuda":
                continue
            assert k in b, f"missing converted subtree {path}/{k}"
            if isinstance(v, dict):
                walk(v, b[k], path + "/" + k)
            else:
                assert np.asarray(b[k]).shape == np.asarray(v).shape, \
                    f"shape mismatch at {path}/{k}: {np.asarray(b[k]).shape} vs {np.asarray(v).shape}"

    walk(target, got)
    assert report["unconsumed"] == []


def test_full_model_round_trip_flagship():
    """VERDICT r1 item 3: a reference-shaped state_dict for the FLAGSHIP
    config must convert into a tree that loads into LNNSeq.init's params
    with zero missing/extra/mis-shaped leaves -- slice head included --
    and the converted params must run a forward pass."""
    from temporal_latticenet_tpu.config import ModelConfig, RuntimeConfig
    from temporal_latticenet_tpu.models import LNNSeq, init_state

    cfg = ModelConfig(nr_classes=26, rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=4)
    rt = RuntimeConfig(max_points=32, capacity_level0=256, capacity_decay=1.0,
                       min_capacity=128, sigma=0.6)
    model = LNNSeq(cfg, rt)
    pos = jnp.zeros((32, 3)); val = jnp.zeros((32, 1)); msk = jnp.ones((32,), bool)
    init_fn = jax.jit(lambda k: model.init(k, pos, val, msk,
                                           init_state(cfg, rt), final=True))
    target = jax.tree_util.tree_map(np.asarray, init_fn(jax.random.PRNGKey(0))["params"])

    sd = tc.export_state_dict(target, cfg)
    converted, report = tc.convert_state_dict(sd, cfg)
    got = converted["params"]
    assert report["unconsumed"] == []

    tgt_flat = {"/".join(str(k.key) for k in p): l for p, l in
                jax.tree_util.tree_flatten_with_path(target)[0]}
    got_flat = {"/".join(str(k.key) for k in p): l for p, l in
                jax.tree_util.tree_flatten_with_path(got)[0]}
    assert set(tgt_flat) == set(got_flat), (
        "missing: %s extra: %s" % (sorted(set(tgt_flat) - set(got_flat)),
                                   sorted(set(got_flat) - set(tgt_flat))))
    for k in tgt_flat:
        assert np.asarray(got_flat[k]).shape == tgt_flat[k].shape, k
        np.testing.assert_array_equal(np.asarray(got_flat[k], np.float32),
                                      tgt_flat[k], err_msg=k)

    # the converted tree must actually run
    as_jnp = jax.tree_util.tree_map(jnp.asarray, converted)
    (logp, sv), _, _ = jax.jit(
        lambda p: model.apply(p, pos, val, msk, init_state(cfg, rt),
                              final=True))(as_jnp)
    assert np.isfinite(np.asarray(logp)).all()

def _reference_shaped_state_dict(cfg):
    """Reference-schema torch-layout state_dict for ``cfg`` via a tiny model
    init + export (the exporter emits the canonical reference key names)."""
    from temporal_latticenet_tpu.config import RuntimeConfig
    from temporal_latticenet_tpu.models import LNNSeq, init_state

    rt = RuntimeConfig(max_points=32, capacity_level0=256, capacity_decay=1.0,
                       min_capacity=128, sigma=0.6)
    model = LNNSeq(cfg, rt)
    pos = jnp.zeros((32, 3)); val = jnp.zeros((32, 1))
    msk = jnp.ones((32,), bool)
    init_fn = jax.jit(lambda k: model.init(k, pos, val, msk,
                                           init_state(cfg, rt), final=True))
    params = jax.tree_util.tree_map(
        np.asarray, init_fn(jax.random.PRNGKey(0))["params"])
    return tc.export_state_dict(params, cfg), params


def test_convert_tolerates_renamed_inner_keys():
    """VERDICT r2 item 7: the inner attribute names of the external
    latticenet_py blocks are unverifiable without the real blob, so the
    converter must survive nesting variants -- ``gn`` instead of ``gn.gn``,
    ``convolution`` instead of ``conv`` -- and still produce the identical
    tree (rank-based disambiguation: GN weights are 1-D, convs 2-D)."""
    from temporal_latticenet_tpu.config import ModelConfig

    cfg = ModelConfig(nr_classes=8, rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=2, pointnet_layers=(4, 8),
                      pointnet_start_nr_channels=8, nr_downsamples=2,
                      nr_blocks_down_stage=(1, 1), nr_blocks_bottleneck=1,
                      nr_blocks_up_stage=(1, 1))
    sd, _ = _reference_shaped_state_dict(cfg)
    base, report = tc.convert_state_dict(sd, cfg)
    assert report["unconsumed"] == []

    conv_prefixes = {k[: -len(".conv.weight")] for k, v in sd.items()
                     if k.endswith(".conv.weight")
                     and np.asarray(v).ndim == 2
                     and "point_net_seq" not in k}
    renamed = {}
    for k, v in sd.items():
        k2 = k.replace(".gn.gn.", ".gn.")
        for p in conv_prefixes:
            if k2.startswith(p + ".conv."):
                k2 = p + ".convolution." + k2[len(p + ".conv."):]
                break
        renamed[k2] = v
    got, report2 = tc.convert_state_dict(renamed, cfg)
    assert report2["unconsumed"] == []

    bf = {"/".join(str(p.key) for p in path): leaf for path, leaf in
          jax.tree_util.tree_flatten_with_path(base)[0]}
    gf = {"/".join(str(p.key) for p in path): leaf for path, leaf in
          jax.tree_util.tree_flatten_with_path(got)[0]}
    assert set(bf) == set(gf)
    for k in bf:
        np.testing.assert_array_equal(np.asarray(bf[k]), np.asarray(gf[k]),
                                      err_msg=k)


def test_convert_unresolvable_inner_reports_keys():
    """A genuinely missing inner module must fail loudly, listing the keys
    it found under the prefix (strict mismatch report, not a silent skip)."""
    from temporal_latticenet_tpu.config import ModelConfig

    cfg = ModelConfig(nr_classes=8, rnn_modules=("gru", "gru", "aflow", "gru"),
                      frames_per_seq=2, pointnet_layers=(4, 8),
                      pointnet_start_nr_channels=8, nr_downsamples=2,
                      nr_blocks_down_stage=(1, 1), nr_blocks_bottleneck=1,
                      nr_blocks_up_stage=(1, 1))
    sd, _ = _reference_shaped_state_dict(cfg)
    broken = {k: v for k, v in sd.items()
              if not k.startswith("coarsens_list.0.gn")}
    with pytest.raises(KeyError, match="coarsens_list.0"):
        tc.convert_state_dict(broken, cfg)


def _hostile_cfg():
    from temporal_latticenet_tpu.config import ModelConfig
    return ModelConfig(nr_classes=8, rnn_modules=("gru", "gru", "aflow", "gru"),
                       frames_per_seq=2, pointnet_layers=(4, 8),
                       pointnet_start_nr_channels=8, nr_downsamples=2,
                       nr_blocks_down_stage=(1, 1), nr_blocks_bottleneck=1,
                       nr_blocks_up_stage=(1, 1))


def test_validate_converted_clean_and_transposed():
    """VERDICT r3 item 8: a converted tree validates leaf-by-leaf against a
    fresh-init template; a TRANSPOSED tensor (the classic layout surprise a
    real .pt could spring) fails with the exact param path, both shapes,
    and a transposition hint -- never a silent load."""
    cfg = _hostile_cfg()
    sd, params = _reference_shaped_state_dict(cfg)
    converted, report = tc.convert_state_dict(sd, cfg)
    assert report["unconsumed"] == []
    tc.validate_converted(converted["params"], params)  # clean: no raise

    # transpose a non-square conv weight (8 -> 16 coarsen)
    hostile = dict(sd)
    k = "coarsens_list.0.conv.weight"
    assert np.asarray(hostile[k]).shape[0] != np.asarray(hostile[k]).shape[1]
    hostile[k] = np.ascontiguousarray(np.asarray(hostile[k]).T)
    converted2, _ = tc.convert_state_dict(hostile, cfg)
    with pytest.raises(ValueError) as ei:
        tc.validate_converted(converted2["params"], params)
    msg = str(ei.value)
    assert "coarsens_list_0/conv/kernel" in msg
    assert "transposed?" in msg
    assert "1 problem" in msg


def test_validate_converted_missing_and_extra():
    """Dropped and foreign leaves are each reported by path."""
    cfg = _hostile_cfg()
    sd, params = _reference_shaped_state_dict(cfg)
    converted, _ = tc.convert_state_dict(sd, cfg)
    broken = jax.tree_util.tree_map(lambda x: x, converted["params"])
    del broken["coarsens_list_1"]["gn"]["scale"]
    broken["coarsens_list_1"]["gn"]["rogue"] = np.zeros((3,), np.float32)
    with pytest.raises(ValueError) as ei:
        tc.validate_converted(broken, params)
    msg = str(ei.value)
    assert "missing param: coarsens_list_1/gn/scale" in msg
    assert "extra param not in model: coarsens_list_1/gn/rogue" in msg


def test_load_pt_checkpoint_end_to_end(tmp_path):
    """checkpoint.load routes a real .pt file through the converter with
    validation (the BASELINE 'from pretrained .pt' path), and a .pt with a
    key the converter cannot route is a hard, named error."""
    torch = pytest.importorskip("torch")
    from temporal_latticenet_tpu.train import checkpoint as ckpt

    cfg = _hostile_cfg()
    sd, params = _reference_shaped_state_dict(cfg)
    pt = tmp_path / "ref.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(pt))
    restored = ckpt.load(str(pt), params, cfg=cfg)
    assert restored["step"] == 0
    flat_a = jax.tree_util.tree_leaves(restored["params"])
    flat_b = jax.tree_util.tree_leaves(
        tc.convert_state_dict(sd, cfg)[0]["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    hostile = dict(sd)
    hostile["surprise_module.weight"] = np.zeros((2, 2), np.float32)
    pt2 = tmp_path / "hostile.pt"
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in hostile.items()}, str(pt2))
    with pytest.raises(ValueError, match="surprise_module.weight"):
        ckpt.load(str(pt2), params, cfg=cfg)
