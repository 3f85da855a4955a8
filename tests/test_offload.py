"""Host offload / teardown / LRU pipeline vault (the mmgp role,
reference nodes.py:115,5382-5390,5449-5463)."""

import numpy as np

from comfy3d_tpu.parallel import (PipelineVault, is_offloaded, offload,
                                  restore, teardown)


class _FakePipe:
    def __init__(self):
        import jax.numpy as jnp
        self.params = {"unet": {"kernel": jnp.ones((8, 8))},
                       "vae": {"bias": jnp.zeros((4,))}}


def test_offload_restore_roundtrip():
    import jax
    pipe = _FakePipe()
    before = jax.tree.map(np.asarray, pipe.params)
    assert not is_offloaded(pipe)
    offload(pipe)
    assert is_offloaded(pipe)
    assert isinstance(pipe.params["unet"]["kernel"], np.ndarray)
    restore(pipe)
    assert not is_offloaded(pipe)
    after = jax.tree.map(np.asarray, pipe.params)
    np.testing.assert_array_equal(before["unet"]["kernel"],
                                  after["unet"]["kernel"])


def test_offloaded_pipe_still_computes():
    import jax.numpy as jnp
    pipe = _FakePipe()
    offload(pipe)
    # numpy weights stream back to device per dispatch
    out = jnp.dot(jnp.ones((2, 8)), pipe.params["unet"]["kernel"])
    assert np.asarray(out).shape == (2, 8)


def test_teardown_drops_params():
    pipe = _FakePipe()
    teardown(pipe)
    assert pipe.params is None


def test_vault_lru_offloads_oldest():
    vault = PipelineVault(max_resident=2)
    a, b, c = _FakePipe(), _FakePipe(), _FakePipe()
    vault.admit(a)
    vault.admit(b)
    assert not is_offloaded(a) and not is_offloaded(b)
    vault.admit(c)
    assert is_offloaded(a)                  # LRU victim
    assert not is_offloaded(b) and not is_offloaded(c)
    vault.touch(a)                          # reuse restores it
    assert not is_offloaded(a)
    assert is_offloaded(b)                  # b became the victim
    vault.evict_all()
    assert is_offloaded(a) and is_offloaded(c)