"""Checkpoint import/export tests (reference main_image.py:219-256,
misc.py:296-352).  torch (CPU) is only an oracle for layout conventions."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dynamic_tuning_tpu.config import ModelConfig, SelectConfig, TuningConfig
from dynamic_tuning_tpu.models.vit import VisionTransformer
from dynamic_tuning_tpu.train import checkpoint as C
from dynamic_tuning_tpu.train.engine import create_train_state
from dynamic_tuning_tpu.train.optim import make_optimizer, partition_params
from dynamic_tuning_tpu.utils.pos_embed import interpolate_pos_embed


def _tiny(num_classes=10):
    cfg = ModelConfig(img_size=32, patch_size=8, num_classes=num_classes,
                      embed_dim=64, depth=2, num_heads=4)
    model = VisionTransformer(cfg, tuning=TuningConfig(ffn_num=8, d_model=64),
                              select=SelectConfig(), dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params, x


def _fake_torch_sd(params, num_classes=10):
    """Build a torch-layout state dict carrying random values for the backbone
    keys our model expects."""
    rs = np.random.RandomState(0)
    sd = {}

    def t(shape):  # torch tensor
        return torch.tensor(rs.randn(*shape).astype(np.float32))

    sd["cls_token"] = t((1, 1, 64))
    sd["pos_embed"] = t((1, 17, 64))
    sd["patch_embed.proj.weight"] = t((64, 3, 8, 8))     # OIHW
    sd["patch_embed.proj.bias"] = t((64,))
    for i in range(2):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = t((64,))
        sd[p + "norm1.bias"] = t((64,))
        sd[p + "attn.qkv.weight"] = t((192, 64))
        sd[p + "attn.qkv.bias"] = t((192,))
        sd[p + "attn.proj.weight"] = t((64, 64))
        sd[p + "attn.proj.bias"] = t((64,))
        sd[p + "norm2.weight"] = t((64,))
        sd[p + "norm2.bias"] = t((64,))
        sd[p + "mlp.fc1.weight"] = t((256, 64))
        sd[p + "mlp.fc1.bias"] = t((256,))
        sd[p + "mlp.fc2.weight"] = t((64, 256))
        sd[p + "mlp.fc2.bias"] = t((64,))
    sd["norm.weight"] = t((64,))
    sd["norm.bias"] = t((64,))
    sd["head.weight"] = t((num_classes, 64))
    sd["head.bias"] = t((num_classes,))
    sd["pre_logits.fc.weight"] = t((64, 64))
    sd["pre_logits.fc.bias"] = t((64,))
    return {k: v.numpy() for k, v in sd.items()}


def test_import_pretrained_loads_backbone_and_reports_missing():
    model, params, x = _tiny()
    sd = _fake_torch_sd(params)
    new_params, missing = C.import_pretrained(params, sd, logger=None)
    # linear orientation: flax kernel == torch weight.T
    np.testing.assert_allclose(
        np.asarray(new_params["blocks_0"]["attn"]["qkv"]["kernel"]),
        sd["blocks.0.attn.qkv.weight"].T, rtol=1e-6)
    # conv orientation OIHW -> HWIO
    np.testing.assert_allclose(
        np.asarray(new_params["patch_embed"]["proj"]["kernel"]),
        sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
    # missing = adapter + router params only (head was loaded: same shape)
    missing_mods = {p[-2] for p in missing if len(p) > 1}
    assert missing_mods == {"down_proj", "up_proj", "mlp_head"}


def test_import_head_surgery_on_class_mismatch():
    model, params, x = _tiny(num_classes=7)
    sd = _fake_torch_sd(params, num_classes=10)   # mismatched head
    new_params, missing = C.import_pretrained(params, sd, logger=None)
    assert ("head", "kernel") in missing and ("head", "bias") in missing
    np.testing.assert_array_equal(np.asarray(new_params["head"]["kernel"]),
                                  np.asarray(params["head"]["kernel"]))


def test_linear_orientation_matches_torch_forward():
    """Golden: a converted torch Linear must produce identical outputs."""
    lin = torch.nn.Linear(6, 4)
    x = np.random.RandomState(1).randn(3, 6).astype(np.float32)
    ref = lin(torch.tensor(x)).detach().numpy()
    kernel = lin.weight.detach().numpy().T
    bias = lin.bias.detach().numpy()
    ours = np.asarray(jnp.asarray(x) @ jnp.asarray(kernel) + jnp.asarray(bias))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_conv_orientation_matches_torch_forward():
    """Golden: converted patch-embed conv == torch Conv2d with stride=kernel."""
    conv = torch.nn.Conv2d(3, 5, kernel_size=4, stride=4)
    x = np.random.RandomState(2).randn(1, 3, 8, 8).astype(np.float32)
    ref = conv(torch.tensor(x)).detach().numpy()          # NCHW
    kernel = conv.weight.detach().numpy().transpose(2, 3, 1, 0)  # HWIO
    bias = conv.bias.detach().numpy()
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(kernel),
        window_strides=(4, 4), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_pos_embed_interpolation_identity_and_resize():
    pe = np.random.RandomState(3).randn(1, 17, 8).astype(np.float32)
    same = interpolate_pos_embed(pe, 16)
    np.testing.assert_array_equal(same, pe)
    up = interpolate_pos_embed(pe, 64)     # 4x4 -> 8x8
    assert up.shape == (1, 65, 8)
    np.testing.assert_array_equal(up[:, 0], pe[:, 0])  # CLS passthrough


def test_save_load_checkpoint_roundtrip(tmp_path):
    model, params, x = _tiny()
    trainable, frozen = partition_params(params)
    tx = make_optimizer(1e-3, steps_per_epoch=5)
    state = create_train_state(trainable, frozen, tx, jax.random.PRNGKey(0))
    path = C.save_checkpoint(str(tmp_path), state, epoch=3,
                             extra={"metric": 88.2})
    state2, epoch, extra = C.load_checkpoint(path, state)
    assert epoch == 3 and abs(extra["metric"] - 88.2) < 1e-9
    for k in state.trainable:
        np.testing.assert_array_equal(np.asarray(state.trainable[k]),
                                      np.asarray(state2.trainable[k]))
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           jax.tree_util.tree_map(np.asarray, state.opt_state),
                           jax.tree_util.tree_map(np.asarray, state2.opt_state))


def test_auto_remove_prunes_older(tmp_path):
    model, params, x = _tiny()
    trainable, frozen = partition_params(params)
    tx = make_optimizer(1e-3, steps_per_epoch=5)
    state = create_train_state(trainable, frozen, tx, jax.random.PRNGKey(0))
    C.save_checkpoint(str(tmp_path), state, epoch=1)
    C.save_checkpoint(str(tmp_path), state, epoch=2, auto_remove=True)
    files = sorted(os.listdir(tmp_path))
    assert files == ["checkpoint-2.msgpack"]


def test_async_save_roundtrip(tmp_path):
    model, params, x = _tiny()
    trainable, frozen = partition_params(params)
    tx = make_optimizer(1e-3, steps_per_epoch=5)
    state = create_train_state(trainable, frozen, tx, jax.random.PRNGKey(0))
    path = C.save_checkpoint(str(tmp_path), state, epoch=7, blocking=False)
    C.wait_for_async_saves()
    state2, epoch, _ = C.load_checkpoint(path, state)
    assert epoch == 7
    for k in state.trainable:
        np.testing.assert_array_equal(np.asarray(state.trainable[k]),
                                      np.asarray(state2.trainable[k]))


def test_orbax_roundtrip(tmp_path):
    """Orbax backend: async sharded save -> restore reproduces the TrainState
    (ROADMAP pod-scale checkpointing; complements the msgpack path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from dynamic_tuning_tpu.train import checkpoint as C
    from dynamic_tuning_tpu.train.engine import create_train_state

    tr = {("a", "w"): jnp.arange(6.0).reshape(2, 3)}
    fr = {("b", "w"): jnp.ones((4,), jnp.float32) * 2}
    tx = optax.adamw(1e-3)
    state = create_train_state(tr, fr, tx, jax.random.PRNGKey(0))
    state = state._replace(step=jnp.asarray(7, jnp.int32))

    out = str(tmp_path / "orbax")
    C.save_checkpoint_orbax(out, state, epoch=3, extra={"metric": 0.5})
    C.wait_for_async_saves()

    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, epoch, extra = C.load_checkpoint_orbax(out, zero)
    assert epoch == 3 and abs(extra["metric"] - 0.5) < 1e-6
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.trainable[("a", "w")]),
                                  np.asarray(tr[("a", "w")]))
    np.testing.assert_array_equal(np.asarray(restored.frozen[("b", "w")]),
                                  np.asarray(fr[("b", "w")]))
    # auto_remove keeps only the newest step
    C.save_checkpoint_orbax(out, state, epoch=4)
    C.wait_for_async_saves()
    restored2, epoch2, _ = C.load_checkpoint_orbax(out, zero)
    assert epoch2 == 4


def test_orbax_resume_then_auto_remove_prunes(tmp_path):
    """Regression (round-2 advisor): a resume-time load creates the manager
    with max_to_keep=None; subsequent auto_remove saves into the same dir
    must still prune instead of silently reusing the unlimited manager."""
    import jax
    import jax.numpy as jnp
    import optax
    from dynamic_tuning_tpu.train import checkpoint as C
    from dynamic_tuning_tpu.train.engine import create_train_state

    tr = {("a", "w"): jnp.arange(4.0)}
    tx = optax.adamw(1e-3)
    state = create_train_state(tr, {}, tx, jax.random.PRNGKey(0))
    out = str(tmp_path / "orbax")
    C.save_checkpoint_orbax(out, state, epoch=1)
    C.wait_for_async_saves()

    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    C.load_checkpoint_orbax(out, zero)  # caches a max_to_keep=None manager
    C.save_checkpoint_orbax(out, state, epoch=2, auto_remove=True)
    C.save_checkpoint_orbax(out, state, epoch=3, auto_remove=True)
    C.wait_for_async_saves()
    mgr = C._orbax_manager(out, 1)
    assert sorted(mgr.all_steps()) == [3], mgr.all_steps()


def test_aux_state_sidecar_roundtrip(tmp_path):
    """SyncBN batch_stats sidecar: save_aux_state/load_aux_state round-trip,
    auto_remove pruning, and template passthrough when no sidecar exists."""
    import jax.numpy as jnp
    import numpy as np
    from dynamic_tuning_tpu.train import checkpoint as C

    stats = {"bn": {"mean": jnp.arange(4.0), "var": jnp.ones((4,)) * 2}}
    out = str(tmp_path)
    C.save_aux_state(out, "batch_stats", stats, step=10, auto_remove=True)
    C.save_aux_state(out, "batch_stats", jax.tree_util.tree_map(
        lambda v: v + 1, stats), step=20, auto_remove=True)
    import glob as g
    files = g.glob(out + "/aux-batch_stats-*.msgpack")
    assert len(files) == 1 and "-20." in files[0]    # pruned step 10

    template = jax.tree_util.tree_map(jnp.zeros_like, stats)
    restored = C.load_aux_state(out, "batch_stats", template)
    np.testing.assert_array_equal(np.asarray(restored["bn"]["mean"]),
                                  np.arange(4.0) + 1)
    # no sidecar -> template unchanged
    same = C.load_aux_state(str(tmp_path / "empty"), "batch_stats", template)
    assert same is template
