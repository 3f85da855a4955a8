"""TripoSG latent-set VAE (flax).

Counterpart of `Gen_3D_Modules/TripoSG/models/autoencoders/
autoencoder_kl_triposg.py`: a frequency positional embedder
(embeddings.py:5-96, include_pi=False), an encoder of one cross-attn +
N self-attn DiTBlocks (:26-87), and a decoder of N self-attn blocks
whose output is a kv-cache queried by a final cross-attn block over
frequency-embedded points (:90-216, logits sign-flipped at :214). The
blocks are the HunyuanDiT-lineage family in `dit.py` with qk_norm=False
and a LayerNorm on the cross-attention context
(cross_attention_norm_type="layer_norm", :132).

Also the substrate of PartCrafter's TripoSGVAE-derived autoencoder.

TPU notes: the reference's `num_chunks` python loop over query points is
replaced by `models.vecset.vae.decode_volume`'s static chunk axis under
one jit; the kv-cache split (self-attn stack runs once, the cross-attn
query block runs per chunk) is preserved because it is what makes dense
volume decode O(N_latents²) once instead of per-chunk.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .dit import DiTBlock, TripoSGDiTConfig


@dataclasses.dataclass(frozen=True)
class TripoSGVAEConfig:
    latent_channels: int = 64
    num_latents: int = 2048          # sampling-time token count
    heads: int = 8
    width_encoder: int = 512
    width_decoder: int = 1024
    num_layers_encoder: int = 8
    num_layers_decoder: int = 16
    num_freqs: int = 8
    include_pi: bool = False
    scale_factor: float = 1.0

    @property
    def embed_out_dim(self) -> int:
        return 3 * (2 * self.num_freqs + 1)


def freq_embed(x, num_freqs: int = 8, include_pi: bool = False):
    """FrequencyPositionalEmbedding (embeddings.py:76-96): dim-major
    interleave [x, sin(x⊗f), cos(x⊗f)], f = 2^0..2^(F-1) (·π opt)."""
    freqs = 2.0 ** np.arange(num_freqs, dtype=np.float32)
    if include_pi:
        freqs = freqs * np.pi
    emb = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(emb), jnp.cos(emb)], axis=-1)


def _block_cfg(width: int, heads: int, cross_dim: int | None = None):
    return TripoSGDiTConfig(width=width, heads=heads,
                            cross_attention_dim=cross_dim or width)


class TripoSGVAE(nn.Module):
    cfg: TripoSGVAEConfig = TripoSGVAEConfig()

    def setup(self):
        c = self.cfg
        # encoder (autoencoder_kl_triposg.py:26-87)
        self.enc_proj_in = nn.Dense(c.width_encoder, name="enc_proj_in")
        ecfg = _block_cfg(c.width_encoder, c.heads)
        self.enc_blocks = [
            DiTBlock(ecfg, self_attn=(i > 0), cross_attn=(i == 0),
                     qk_norm=False, cross_norm=(i == 0),
                     name=f"enc_blocks_{i}")
            for i in range(c.num_layers_encoder + 1)]
        self.enc_norm_out = nn.LayerNorm(epsilon=1e-5,
                                         name="enc_norm_out")
        self.quant = nn.Dense(2 * c.latent_channels, name="quant")
        # decoder (:90-216)
        self.post_quant = nn.Dense(c.width_decoder, name="post_quant")
        dcfg = _block_cfg(c.width_decoder, c.heads)
        self.dec_blocks = [
            DiTBlock(dcfg, self_attn=True, cross_attn=False,
                     qk_norm=False, name=f"dec_blocks_{i}")
            for i in range(c.num_layers_decoder)]
        self.dec_query_block = DiTBlock(
            dcfg, self_attn=False, cross_attn=True, qk_norm=False,
            cross_norm=True, name="dec_query_block")
        self.proj_query = nn.Dense(c.width_decoder, name="proj_query")
        self.dec_norm_out = nn.LayerNorm(epsilon=1e-5,
                                         name="dec_norm_out")
        self.proj_out = nn.Dense(1, name="proj_out")

    def encode(self, x_q, x_kv):
        """Queries [B, N_tok, D] and kv [B, N_all, D] where
        D = embed_out_dim + feature_dim, built by callers as
        [freq_embed(xyz), features] (autoencoder_kl_triposg.py:439-456;
        FPS token sampling happens host-side). → [B, N_tok, 2·latent]
        (mean | logvar)."""
        h = self.enc_proj_in(x_q)
        ctx = self.enc_proj_in(x_kv)
        for i, blk in enumerate(self.enc_blocks):
            h = blk(h, context=ctx) if i == 0 else blk(h)
        return self.quant(self.enc_norm_out(h))

    def __call__(self, latents):
        """[B, N, latent_channels] → decoded kv-cache [B, N, W]
        (the reference's `kv_cache`, decoder blocks[:-1])."""
        h = self.post_quant(latents)
        for blk in self.dec_blocks:
            h = blk(h)
        return h

    def query(self, decoded, points):
        """decoded kv [B, N, W]; points [B, M, 3] → SDF logits [B, M]
        (sign-flipped as autoencoder_kl_triposg.py:214)."""
        c = self.cfg
        q = self.proj_query(freq_embed(points, c.num_freqs,
                                       c.include_pi))
        h = self.dec_query_block(q, context=decoded)
        return -self.proj_out(self.dec_norm_out(h))[..., 0]

    def init_all(self, latents, points):
        decoded = self(latents)
        return self.query(decoded, points)
