"""CRM reconstruction tests (tiny config)."""

import numpy as np
import pytest

from comfy3d_tpu.models.crm import CRMConfig, CRMReconPipeline


@pytest.fixture(scope="module")
def pipe():
    return CRMReconPipeline.init_random(cfg=CRMConfig.tiny())


def test_views_to_mesh(pipe):
    rng = np.random.RandomState(0)
    imgs = rng.rand(6, 32, 32, 3).astype(np.float32)
    ccms = rng.rand(6, 32, 32, 3).astype(np.float32)
    mesh = pipe(imgs, ccms)
    assert mesh.v.shape[1] == 3
    if mesh.num_vertices:
        assert mesh.vc is not None
        assert np.abs(np.asarray(mesh.v)).max() <= pipe.cfg.scale + 1e-4


def test_query_contract(pipe):
    import jax.numpy as jnp
    from comfy3d_tpu.models.crm.pipeline import CRMModel
    rng = np.random.RandomState(1)
    views = jnp.asarray(rng.rand(1, 6, 32, 32, 6).astype(np.float32))
    planes = pipe._forward(pipe.params, views)[0]
    pts = jnp.asarray(rng.rand(9, 3).astype(np.float32) - 0.5)
    sd, df, rgb, w = CRMModel(pipe.cfg).apply(
        {"params": pipe.params}, planes, pts, method=CRMModel.query)
    assert sd.shape == (9,) and df.shape == (9, 3)
    assert w.shape == (9, 21)                 # flexicubes weights
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))


def test_nodes_registered():
    from comfy3d_tpu.nodes.graph import load_node_mappings
    m = load_node_mappings()
    for name in ("[Comfy3D] Load CRM MVDiffusion Model",
                 "[Comfy3D] CRM Images MVDiffusion Model",
                 "[Comfy3D] CRM CCMs MVDiffusion Model",
                 "[Comfy3D] Load Convolutional Reconstruction Model",
                 "[Comfy3D] Convolutional Reconstruction Model"):
        assert name in m
