"""Headless execution of the reference example workflows.

SURVEY.md §4: the `example_workflows/*.json` fixtures are the de-facto
acceptance tests of the reference. Each test loads the ACTUAL JSON,
swaps every model loader for a tiny-config pipeline, dials size/step
widgets down, synthesizes the input images, and runs the full graph
through the standalone executor.
"""

import dataclasses as dc
import json
import os

import numpy as np
import pytest

import test_diffusion as td
from comfy3d_tpu.nodes import run_workflow
from comfy3d_tpu.nodes import base as node_base
from comfy3d_tpu.nodes.graph import load_node_mappings

WF_ROOT = "/root/reference/example_workflows"

pytestmark = pytest.mark.skipif(not os.path.isdir(WF_ROOT),
                                reason="reference workflows not mounted")

NODE_CLASS_MAPPINGS = load_node_mappings()


# ------------------------------------------------------------------ #
# Tiny loader patches
# ------------------------------------------------------------------ #
def _tiny_triposr():
    from comfy3d_tpu.models.triposr import TripoSRConfig, TripoSRPipeline
    return TripoSRPipeline.init_random(cfg=TripoSRConfig(
        cond_image_size=32, plane_size=8, token_channels=64,
        num_layers=2, heads=4, dim_head=16, cross_attention_dim=48,
        triplane_channels=8, mlp_neurons=16, mlp_hidden_layers=2,
        vit_hidden=48, vit_layers=2, vit_heads=2))


def _tiny_instantmesh():
    from comfy3d_tpu.models.instantmesh import (InstantMeshConfig,
                                                InstantMeshPipeline)
    return InstantMeshPipeline.init_random(
        cfg=InstantMeshConfig(
            encoder_feat_dim=48, transformer_dim=64,
            transformer_layers=2, transformer_heads=4,
            triplane_low_res=8, triplane_dim=8, grid_res=12,
            decoder_hidden=16, decoder_layers=2, vit_layers=2,
            vit_heads=2, vit_mlp=96, patch=8), image_size=32)


def _tiny_sf3d():
    from comfy3d_tpu.models.sf3d import SF3DConfig, SF3DPipeline
    return SF3DPipeline.init_random(cfg=SF3DConfig.tiny())


def _tiny_tgs():
    from comfy3d_tpu.models.tgs import TGSConfig, TGSPipeline
    return TGSPipeline.init_random(cfg=TGSConfig.tiny())


def _tiny_trellis():
    from comfy3d_tpu.models.trellis import (TrellisConfig,
                                            TrellisImageTo3DPipeline)
    return TrellisImageTo3DPipeline.init_random(cfg=TrellisConfig.tiny())


def _tiny_craftsman():
    from comfy3d_tpu.models.craftsman import (CraftsmanConfig,
                                              CraftsmanPipeline)
    return CraftsmanPipeline.init_random(cfg=CraftsmanConfig.tiny())


def _tiny_svrm():
    from comfy3d_tpu.models.hunyuan3d_v1 import SVRMConfig, SVRMPipeline
    pipe = SVRMPipeline.init_random(cfg=SVRMConfig.tiny())
    pipe.use_lite = True
    return pipe


def _tiny_partcrafter():
    from comfy3d_tpu.models.partcrafter import (PartCrafterConfig,
                                                PartCrafterPipeline)
    return PartCrafterPipeline.init_random(cfg=PartCrafterConfig.tiny())


def _tiny_crm_recon():
    from comfy3d_tpu.models.crm import CRMConfig, CRMReconPipeline
    return CRMReconPipeline.init_random(cfg=CRMConfig.tiny())


def _tiny_mvdream(views=4, stage2=False):
    from comfy3d_tpu.models.mvdream import MVDreamConfig, MVDreamPipeline
    cfg = MVDreamConfig(
        image_size=32, num_views=views,
        unet=dc.replace(td.tiny_unet_cfg(), mv_views=views,
                        cross_attention_dim=16,
                        in_channels=8 if stage2 else 4),
        vae=td.tiny_vae_cfg(), prompt_tokens=7, prompt_dim=16)
    return MVDreamPipeline.init_random(cfg=cfg)


def _tiny_wonder3d():
    from comfy3d_tpu.models.wonder3d import (Wonder3DConfig,
                                             Wonder3DPipeline)
    # 6 views: the reference workflows index views [0..5] out of the
    # canonical Wonder3D six (fewer views would leave the LGM feed
    # short after Get_Images_From_Batch_Indexed)
    cfg = Wonder3DConfig(
        image_size=32, num_views=6,
        unet=dc.replace(td.tiny_unet_cfg(), in_channels=8, mv_views=6,
                        cd_joint=True),
        vae=td.tiny_vae_cfg())
    return Wonder3DPipeline.init_random(cfg=cfg)


def _tiny_era3d():
    from comfy3d_tpu.models.era3d import Era3DConfig, Era3DPipeline
    cfg = Era3DConfig(
        image_size=32, num_views=6, prompt_tokens=7, prompt_dim=16,
        unet=dc.replace(td.tiny_unet_cfg(), in_channels=8, mv_views=6,
                        mv_rowwise=True, cd_joint=True),
        vae=td.tiny_vae_cfg())
    return Era3DPipeline.init_random(cfg=cfg)


def _tiny_zero123plus():
    from comfy3d_tpu.models.zero123plus import (Zero123PlusConfig,
                                                Zero123PlusPipeline)
    return Zero123PlusPipeline.init_random(cfg=Zero123PlusConfig(
        height=48, width=32, unet=td.tiny_unet_cfg(),
        vae=td.tiny_vae_cfg(), cond_size=32, prompt_tokens=3,
        prompt_dim=16))


def _tiny_unique3d_mv():
    from comfy3d_tpu.models.unique3d import (Unique3DImage2MVPipeline,
                                             Unique3DMVConfig)
    return Unique3DImage2MVPipeline.init_random(cfg=Unique3DMVConfig(
        image_size=32,
        unet=dc.replace(td.tiny_unet_cfg(), in_channels=8, mv_views=4),
        vae=td.tiny_vae_cfg(), prompt_tokens=1, prompt_dim=16))


def _tiny_unique3d_normal():
    from comfy3d_tpu.models.unique3d import (
        Unique3DImage2NormalPipeline, Unique3DNormalConfig)
    return Unique3DImage2NormalPipeline.init_random(
        cfg=Unique3DNormalConfig(
            image_size=32,
            unet=dc.replace(td.tiny_unet_cfg(), in_channels=8),
            vae=td.tiny_vae_cfg(), prompt_tokens=1, prompt_dim=16))


def _tiny_hunyuan_mvd():
    from comfy3d_tpu.models.hunyuan3d_v1.mvd import Hunyuan3DV1MVDPipeline
    from comfy3d_tpu.models.zero123plus import Zero123PlusConfig
    return Hunyuan3DV1MVDPipeline.init_random(cfg=Zero123PlusConfig(
        height=48, width=32, unet=td.tiny_unet_cfg(),
        vae=td.tiny_vae_cfg(), cond_size=32, prompt_tokens=3,
        prompt_dim=16))


def _tiny_hunyuan_shape():
    from comfy3d_tpu.models.hunyuan3d import (Hunyuan3DShapeConfig,
                                              Hunyuan3DShapePipeline)
    return Hunyuan3DShapePipeline.init_random(
        cfg=Hunyuan3DShapeConfig.tiny())


def _tiny_paint():
    from comfy3d_tpu.models.hunyuan3d import (Hunyuan3DPaintPipeline,
                                              PaintConfig)
    pipe = Hunyuan3DPaintPipeline.init_random(cfg=PaintConfig(
        render_size=32, texture_size=64,
        unet=dc.replace(td.tiny_unet_cfg(), in_channels=12, mv_views=6),
        vae=td.tiny_vae_cfg(), prompt_tokens=3, prompt_dim=16))
    pipe.default_steps = 2
    return pipe


def _tiny_paint_pbr():
    from comfy3d_tpu.models.hunyuan3d import (Hunyuan3DPaintPipeline,
                                              PaintConfig)
    pipe = Hunyuan3DPaintPipeline.init_random(cfg=PaintConfig(
        render_size=32, texture_size=64,
        unet=dc.replace(td.tiny_unet_cfg(), in_channels=12, mv_views=6),
        vae=td.tiny_vae_cfg(), prompt_tokens=3, prompt_dim=16,
        pbr_settings=("albedo", "mr")))
    pipe.default_steps = 2
    return pipe


def _tiny_yoso():
    from comfy3d_tpu.models.stablegen import (YosoConfig,
                                              YosoNormalsPipeline)
    return YosoNormalsPipeline.init_random(cfg=YosoConfig(
        unet=td.tiny_unet_cfg(), vae=td.tiny_vae_cfg(),
        prompt_tokens=7, prompt_dim=16))


def _tiny_triposg():
    from comfy3d_tpu.models.triposg import TripoSGConfig, TripoSGPipeline
    return TripoSGPipeline.init_random(cfg=TripoSGConfig.tiny())


def _tiny_cg2d():
    from comfy3d_tpu.models.charactergen import (CharacterGen2DConfig,
                                                 CharacterGen2DPipeline)
    return CharacterGen2DPipeline.init_random(cfg=CharacterGen2DConfig(
        width=32, height=48,
        unet=dc.replace(td.tiny_unet_cfg(), mv_views=4),
        vae=td.tiny_vae_cfg(), prompt_tokens=3, prompt_dim=16))


def _tiny_cg_lrm():
    from comfy3d_tpu.models.charactergen import (CharacterGenLRMConfig,
                                                 CharacterGenLRMPipeline)
    return CharacterGenLRMPipeline.init_random(
        cfg=CharacterGenLRMConfig.tiny())


def _tiny_mvadapter_ig():
    from comfy3d_tpu.models.mvadapter import (MVAdapterConfig,
                                              MVAdapterIG2MVPipeline)
    return MVAdapterIG2MVPipeline.init_random(cfg=MVAdapterConfig(
        image_size=32, num_views=3, camera_azims=(0., 120., 240.),
        camera_elevs=(0., 0., 0.),
        unet=dc.replace(td.tiny_unet_cfg(), mv_views=3),
        vae=td.tiny_vae_cfg(), prompt_tokens=3, prompt_dim=16))


def _tiny_lgm():
    from comfy3d_tpu.models.lgm import LGMConfig, LGMPipeline
    return LGMPipeline.init_random(cfg=LGMConfig(
        input_size=32, splat_size=16, down_channels=(8, 16, 32),
        down_attention=(False, False, True), mid_attention=True,
        up_channels=(32, 16), up_attention=(True, False),
        layers_per_block=1, attention_heads=4, norm_groups=4))


@pytest.fixture()
def tiny_world(monkeypatch, tmp_path):
    """Patch every model loader to tiny configs + sandbox IO dirs."""
    monkeypatch.setattr(node_base, "INPUT_ROOT_PATH",
                        str(tmp_path / "in"))
    monkeypatch.setattr(node_base, "OUTPUT_ROOT_PATH",
                        str(tmp_path / "out"))
    os.makedirs(tmp_path / "in", exist_ok=True)
    os.makedirs(tmp_path / "out", exist_ok=True)

    from comfy3d_tpu.nodes import (nodes_charactergen, nodes_crm,
                                   nodes_diffusers, nodes_hunyuan3d,
                                   nodes_models, nodes_mvadapter,
                                   nodes_partcrafter, nodes_stablegen,
                                   nodes_texture, nodes_trellis)

    def patch(cls, fn_name, maker, n_out=1):
        def loader(self, *a, **k):
            out = maker()
            return out if isinstance(out, tuple) else (out,)
        monkeypatch.setattr(cls, fn_name, loader)

    patch(nodes_models.Load_TripoSR_Model, "load_TSR", _tiny_triposr)
    patch(nodes_models.Load_InstantMesh_Reconstruction_Model,
          "load_LRM", _tiny_instantmesh)
    patch(nodes_models.Load_SF3D_Model, "load_SF3D", _tiny_sf3d)
    patch(nodes_models.Load_Triplane_Gaussian_Transformers, "load_TGS",
          _tiny_tgs)
    patch(nodes_models.Load_Craftsman_Shape_Diffusion_Model, "load",
          _tiny_craftsman)
    patch(nodes_models.Load_Large_Multiview_Gaussian_Model,
          nodes_models.Load_Large_Multiview_Gaussian_Model.FUNCTION,
          _tiny_lgm)
    patch(nodes_trellis.Load_Trellis_Structured_3D_Latents_Models,
          "load_pipe", _tiny_trellis)
    patch(nodes_hunyuan3d.Load_Hunyuan3D_V1_Reconstruction_Model,
          "load_model", _tiny_svrm)
    patch(nodes_hunyuan3d.Load_Hunyuan3D_V2_ShapeGen_Pipeline,
          nodes_hunyuan3d.Load_Hunyuan3D_V2_ShapeGen_Pipeline.FUNCTION,
          _tiny_hunyuan_shape)
    patch(nodes_hunyuan3d.Load_Hunyuan3D_21_ShapeGen_Pipeline,
          nodes_hunyuan3d.Load_Hunyuan3D_21_ShapeGen_Pipeline.FUNCTION,
          _tiny_hunyuan_shape)
    patch(nodes_texture.Load_Hunyuan3D_V2_TexGen_Pipeline, "load",
          _tiny_paint)
    patch(nodes_texture.Load_Hunyuan3D_21_TexGen_Pipeline, "load",
          _tiny_paint_pbr)
    patch(nodes_partcrafter.Load_PartCrafter_Pipeline, "load",
          _tiny_partcrafter)
    patch(nodes_partcrafter.Load_PartCrafter_Scene_Pipeline, "load",
          _tiny_partcrafter)
    patch(nodes_crm.Load_CRM_MVDiffusion_Model, "load",
          lambda: (_tiny_mvdream(6), _tiny_mvdream(6, stage2=True)))
    patch(nodes_crm.Load_Convolutional_Reconstruction_Model, "load",
          _tiny_crm_recon)
    patch(nodes_charactergen.Load_CharacterGen_MVDiffusion_Model,
          "load_model", _tiny_cg2d)
    patch(nodes_charactergen.Load_CharacterGen_Reconstruction_Model,
          "load_model", _tiny_cg_lrm)
    patch(nodes_mvadapter.Load_MVAdapter_IG2MV_Pipeline, "load",
          _tiny_mvadapter_ig)
    patch(nodes_stablegen.Load_StableGen_Trellis_Pipeline, "load",
          _tiny_trellis)
    patch(nodes_stablegen.Load_StableGen_StableX_Pipeline, "load",
          _tiny_yoso)

    monkeypatch.setattr(nodes_models.Zero123Plus_Diffusion_Model,
                        "_cached", _tiny_zero123plus())
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "TripoSGPipeline", _tiny_triposg)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "TripoSGScribblePipeline", _tiny_triposg)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "Zero123PlusPipeline", _tiny_zero123plus)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "DiffusionPipeline", _tiny_zero123plus)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "MVDreamPipeline", _tiny_mvdream)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "Wonder3DMVDiffusionPipeline", _tiny_wonder3d)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "Era3DPipeline", _tiny_era3d)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "Unique3DImage2MVCustomPipeline",
                        _tiny_unique3d_mv)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "Unique3DImageCustomPipeline",
                        _tiny_unique3d_normal)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "HunYuan3DMVDStdPipeline", _tiny_hunyuan_mvd)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "Hunyuan3DMVDLitePipeline", _tiny_hunyuan_mvd)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "StableDiffusionPipeline", _tiny_yoso)
    monkeypatch.setitem(nodes_diffusers.DIFFUSERS_PIPE_FACTORIES,
                        "Hunyuan3DDiTFlowMatchingPipeline",
                        _tiny_hunyuan_shape)

    # the Unique3D custom-UNet loader rebuilds full-size pipes; route
    # it to the tiny ones
    def tiny_unet_loader(self, pipe, config_name):
        return ((_tiny_unique3d_mv() if config_name == "image2mvimage"
                 else _tiny_unique3d_normal()),)
    monkeypatch.setattr(nodes_diffusers.Load_Unique3D_Custom_UNet,
                        "load_diffusers_unet", tiny_unet_loader)
    return tmp_path


# ------------------------------------------------------------------ #
# Widget override table
# ------------------------------------------------------------------ #
SIZE_OVERRIDES = {
    "num_inference_steps": 2,
    "diffusion_steps": 2,
    "ss_sampling_steps": 2,
    "slat_sampling_steps": 2,
    "geometry_extract_resolution": 24,
    "octree_resolution": 16,
    "dense_octree_depth": 4,
    "hierarchical_octree_depth": 4,
    "flash_octree_depth": 4,
    "target_face_count": 2000,
    "target_faces_num": 500,
    "texture_size": 64,
    "target_image_width": 32,
    "target_image_height": 48,
    "uv_size": 512,
    "num_parts": 2,
    "num_tokens": 256,
    "height": 32,
    "width": 32,
    "image_resolution": 256,
    "num_views": 3,
    "force_cubes_resolution": 16,
    "voxel_grids_resolution": 12,
    "marching_cude_grids_resolution": 24,
    "marching_cude_grids_batch_size": 24,
    "training_resolution": 32,
    # a 4-iteration random NGP fit never reaches the production
    # density-10 isosurface
    "marching_cude_threshold": 0.2,
    "training_iterations": 4,
    "batch_size": 1,
    "upscale_factor": 1,
    # Convert 3DGS to Mesh with NeRF and Marching Cubes
    "training_nerf_iterations": 8,
    "training_nerf_resolution": 32,
    "marching_cude_grids_resolution": 32,
    "marching_cude_grids_batch_size": 32,
    "training_mesh_iterations": 8,
    "training_mesh_resolution": 64,
    "remesh_after_n_iteration": 128,
    "training_albedo_iterations": 4,
    "training_albedo_resolution": 64,
    "texture_resolution": 128,
}


def _build_overrides(wf, tmp_path, extra=None):
    from comfy3d_tpu.nodes.graph import _widget_input_names
    mesh_path = str(tmp_path / "in" / "asset.obj")
    overrides = {}
    for n in wf["nodes"]:
        if n.get("mode", 0) == 2:
            continue
        cls = NODE_CLASS_MAPPINGS.get(n["type"])
        if cls is None:
            continue
        ov = {}
        linked = {i.get("name") for i in (n.get("inputs") or [])
                  if i.get("link") is not None}
        for name, section, wt, decl in _widget_input_names(cls):
            if name in linked:
                continue
            if name in SIZE_OVERRIDES:
                ov[name] = SIZE_OVERRIDES[name]
            if name in ("mesh_path", "mesh_file_path"):
                ov[name] = mesh_path
            if name == "gs_file_path":
                ov[name] = str(tmp_path / "in" / "asset_gs.ply")
            if name == "directory":
                ov[name] = str(tmp_path / "in" / "mv")
        if n["type"] == "PrimitiveString":
            vals = n.get("widgets_values") or [""]
            if isinstance(vals[0], str) and (
                    "/" in vals[0] or vals[0].endswith((".glb", ".obj",
                                                        ".ply"))):
                ov["value"] = mesh_path
        overrides[n["id"]] = ov
    for nid, kv in (extra or {}).items():
        overrides.setdefault(nid, {}).update(kv)
    return overrides


def _prepare_inputs(wf, tmp_path):
    """Create every image/mesh input the workflow references."""
    import cv2
    from comfy3d_tpu.core.mesh import Mesh
    in_dir = tmp_path / "in"
    for n in wf["nodes"]:
        if n["type"] == "LoadImage":
            name = (n.get("widgets_values") or ["input.png"])[0]
            rgba = np.zeros((64, 64, 4), np.uint8)
            cv2.circle(rgba, (32, 32), 20, (40, 90, 200, 255), -1)
            path = in_dir / str(name)
            os.makedirs(path.parent, exist_ok=True)
            cv2.imwrite(str(path), rgba)
    mv = in_dir / "mv"
    os.makedirs(mv, exist_ok=True)
    for i in range(6):
        img = np.full((32, 32, 3), 30 * (i + 1), np.uint8)
        cv2.imwrite(str(mv / f"v{i}.png"), img)
    v = np.array([[x, y, z] for x in (-.5, .5) for y in (-.5, .5)
                  for z in (-.5, .5)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    Mesh(v=v, f=f).auto_normal().write(str(in_dir / "asset.obj"))
    # a small gaussian splat for Load_3DGS-driven workflows
    from comfy3d_tpu.core.gaussian import GaussianSplat
    from comfy3d_tpu.core.io.ply import save_gs_ply
    rng = np.random.RandomState(0)
    pts = (rng.rand(256, 3).astype(np.float32) - 0.5)
    save_gs_ply(str(in_dir / "asset_gs.ply"),
                GaussianSplat.from_points(
                    pts, colors=rng.rand(256, 3).astype(np.float32),
                    initial_scale=0.05))


# fast set runs in the default suite; the rest only with
# COMFY3D_HEAVY_TESTS=1 (they add ~20 CPU-minutes)
WORKFLOWS_FAST = [
    "TripoSG_to_Mesh.json",
    "Trellis_Image_to_Mesh.json",
    "StableFast3D_to_Mesh.json",
    "Hunyuan3D_V1.json",
    "Zero123Plus_to_InstantMesh.json",
    "PartCrafter/PartCrafter.json",
    # the BASELINE.md-named end-to-end chain (README.md:215): MVDream
    # views → LGM gaussians → 3DGS optimization → NeRF+MC mesh convert
    "MVDream_to_Large_Multiview_Gaussian_Model_to_3DGS and_3DMesh.json",
]
WORKFLOWS_HEAVY = [
    "TripoSG_Scribble_Model.json",
    "Stable3DGen.json",
    "Triplane_Gaussian_Transformers_to_3DGS_and_3DMesh.json",
    "CRM/CRM_Img_to_Multi-views_to_CCMs_to_Mesh.json",
    "CharacterGen/CharacterGen_Vanilla.json",
    "Hunyuan3D_V2/Hunyuan3D_V2.json",
    "MV-Adapter/MV-Adapter-ig2mv.json",
    "Era3D_to_InstantMesh.json",
    "Wonder3D_to_Large_Multiview_Gaussian_Model_to_3DGS and_3DMesh"
    ".json",
    "Multi-View-Images_to_Instant-NGP_to_DiffRast_to_3DMesh.json",
    "[FlexiCubes] Multi-View Depth plus Optional Normal maps to 3D "
    "Mesh.json",
    "Render_Mesh_and_3DGS_Example.json",
    # the 5th BASELINE.json config: 2.1 shape DiT → mesh → PBR texture
    "Hunyuan3D_2_1/Hunyuan2.1-Full.json",
    "Hunyuan3D_2_1/Hunyuan2.1-Shapegen.json",
    "Hunyuan3D_2_1/Hunyuan2.1-Texgen.json",
    # CRM MVDiffusion feeding three different reconstructors
    "CRM/CRM MVDiffusion_to_Craftsman.json",
    "CRM/CRM MVDiffusion_to_InstantMesh.json",
    "CRM/CRM MVDiffusion_to_Unique3D.json",
    "CRM_T2I_V2/CRM_T2I_V2_MVs_Only.json",
    "CRM_T2I_V2/CRM_T2I_V2_to_MV_to_Texture.json",
    "CRM_T2I_V3/CRM_T2I_V3_MVs_Only.json",
    "CRM_T2I_V3/CRM_T2I_V3_to_MV_to_Texture_dora_model_Handgun_Example"
    ".json",
    "CRM_T2I_V3/CRM_T2I_V3_to_MV_to_Texture_lora_model_Cup_Example.json",
    "CharacterGen/CharacterGen_InstantMesh.json",
    "CharacterGen/CharacterGen_to_Unique3D.json",
    # the Hunyuan V2 checkpoint-variant grid (Fast/Turbo/Mini/MV)
    "Hunyuan3D_V2/Hunyuan3D_V2_Fast.json",
    "Hunyuan3D_V2/Hunyuan3D_V2_Turbo.json",
    "Hunyuan3D_V2/Hunyuan3D_V2_MV.json",
    "Hunyuan3D_V2/Hunyuan3D_V2_MV_Fast.json",
    "Hunyuan3D_V2/Hunyuan3D_V2_MV_Turbo.json",
    "Hunyuan3D_V2/Hunyuan3D_V2_Mini.json",
    "Hunyuan3D_V2/Hunyuan3D_V2_Mini_Fast.json",
    "Hunyuan3D_V2/Hunyuan3D_V2_Mini_Turbo.json",
    "MV-Adapter/MV-Adapter-Texturing.json",
    "MV-Adapter/MV-Adapter-tg2mv.json",
    "PartCrafter/PartCrafter-Scene.json",
    "Unique3D/0_MV_RGB.json",
    "Unique3D/2_MV_Normal.json",
    "Unique3D/3_Mesh_Reconstruction.json",
    "Unique3D/Unique3D_with_Era3D_All.json",
]
# The remaining 4 of the reference's 52 example workflows
# (Unique3D/1_MV_RGB_Upscale*.json, Unique3D/Unique3D_All_Stages.json,
# Using_Stack_Orbit_Camera_Poses_to_conditioning_StableZero123.json)
# depend on ComfyUI-core SD machinery (CheckpointLoaderSimple, KSampler,
# IPAdapter, VHS_VideoCombine) that ships with the host app, not with
# the reference pack — out of scope for the standalone executor.
_HEAVY = os.environ.get("COMFY3D_HEAVY_TESTS", "0") == "1"
WORKFLOWS = WORKFLOWS_FAST + (WORKFLOWS_HEAVY if _HEAVY else [])


@pytest.mark.parametrize("rel", WORKFLOWS)
def test_example_workflow(rel, tiny_world):
    path = os.path.join(WF_ROOT, rel)
    if not os.path.exists(path):
        pytest.skip(f"{rel} not present")
    wf = json.load(open(path))
    missing = sorted({n["type"] for n in wf["nodes"]
                      if n.get("mode", 0) != 2
                      and n["type"] not in NODE_CLASS_MAPPINGS})
    assert not missing, f"unimplemented node types: {missing}"
    _prepare_inputs(wf, tiny_world)
    overrides = _build_overrides(wf, tiny_world)
    results = run_workflow(wf, overrides=overrides)
    assert results, "workflow produced no results"
