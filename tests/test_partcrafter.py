"""PartCrafter tests: part-axis DiT semantics + multi-part pipeline."""

import pytest

# compile-heavy / parity tier — excluded from the <2 min
# CI smoke job (ci.yml smoke tier, VERDICT r4 weak #3)
pytestmark = pytest.mark.heavy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfy3d_tpu.models.partcrafter import (PartCrafterConfig,
                                            PartCrafterPipeline)
from comfy3d_tpu.models.partcrafter.pipeline import (PartCrafterDiT,
                                                     PartCrafterDiTConfig,
                                                     merge_parts)
from comfy3d_tpu.models.triposg.dit import TripoSGDiTConfig


@pytest.fixture(scope="module")
def pipe():
    return PartCrafterPipeline.init_random(cfg=PartCrafterConfig.tiny())


def _tiny_dit():
    return PartCrafterDiTConfig(
        base=TripoSGDiTConfig(width=32, in_channels=8, num_layers=3,
                              heads=2, cross_attention_dim=16),
        max_num_parts=8, global_attn_block_ids=(1,))


def test_part_embedding_differentiates_parts():
    cfg = _tiny_dit()
    x = np.zeros((1, 3, 6, 8), np.float32)      # identical latents
    t = np.array([500.0], np.float32)
    ctx = np.random.RandomState(0).randn(1, 4, 16).astype(np.float32)
    pid = np.arange(3, dtype=np.int32)
    params = PartCrafterDiT(cfg).init(jax.random.PRNGKey(0),
                                      jnp.asarray(x), jnp.asarray(t),
                                      jnp.asarray(ctx),
                                      jnp.asarray(pid))["params"]
    out = np.asarray(PartCrafterDiT(cfg).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(ctx), jnp.asarray(pid)))
    # identical inputs but distinct part embeddings → distinct outputs
    assert not np.allclose(out[0, 0], out[0, 1])


def test_global_blocks_couple_parts():
    """With NO global blocks, part outputs are independent of other
    parts' latents; with a global block they are coupled."""
    base = TripoSGDiTConfig(width=32, in_channels=8, num_layers=3,
                            heads=2, cross_attention_dim=16)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 6, 8).astype(np.float32)
    x_mod = x.copy()
    x_mod[0, 1] += 1.0                         # perturb only part 1
    t = np.array([500.0], np.float32)
    ctx = rng.randn(1, 4, 16).astype(np.float32)
    pid = np.arange(2, dtype=np.int32)

    for gids, coupled in (((), False), ((1,), True)):
        cfg = PartCrafterDiTConfig(base=base, max_num_parts=8,
                                   global_attn_block_ids=gids)
        params = PartCrafterDiT(cfg).init(
            jax.random.PRNGKey(2), jnp.asarray(x), jnp.asarray(t),
            jnp.asarray(ctx), jnp.asarray(pid))["params"]
        a = np.asarray(PartCrafterDiT(cfg).apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t),
            jnp.asarray(ctx), jnp.asarray(pid)))
        bout = np.asarray(PartCrafterDiT(cfg).apply(
            {"params": params}, jnp.asarray(x_mod), jnp.asarray(t),
            jnp.asarray(ctx), jnp.asarray(pid)))
        part0_changed = not np.allclose(a[0, 0], bout[0, 0], atol=1e-6)
        assert part0_changed == coupled


def test_pipeline_parts_and_merge(pipe):
    img = np.random.RandomState(0).rand(28, 28, 3).astype(np.float32)
    parts = pipe(img, num_parts=3, seed=1, octree_resolution=24,
                 num_chunks=4096)
    assert len(parts) == 3
    merged = merge_parts(parts)
    assert merged.v.shape[1] == 3
    assert merged.vc is not None


def test_generate_node(pipe, tmp_path, monkeypatch):
    import comfy3d_tpu.nodes.nodes_partcrafter as npc
    monkeypatch.setattr(npc, "OUTPUT_ROOT_PATH", str(tmp_path))
    img = np.random.RandomState(0).rand(1, 28, 28, 3).astype(np.float32)
    zp, gp, proc, merged = npc.PartCrafter_Generate().generate(
        pipe, img, num_parts=2, seed=0, num_inference_steps=2,
        octree_resolution=16)
    import zipfile
    with zipfile.ZipFile(zp) as zf:
        assert len(zf.namelist()) == 2
    assert (tmp_path / "partcrafter_scenes" / "scene.glb").exists()
    assert proc.shape == (1, 28, 28, 3)
    assert merged.num_vertices >= 0


def test_nodes_registered():
    from comfy3d_tpu.nodes.graph import load_node_mappings
    m = load_node_mappings()
    for name in ("[Comfy3D] Load PartCrafter Pipeline",
                 "[Comfy3D] Load PartCrafter Scene Pipeline",
                 "[Comfy3D] PartCrafter Generate"):
        assert name in m
