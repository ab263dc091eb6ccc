"""The reference's shipped configs must load into native dataclasses
(north-star config-API compatibility)."""
import pytest

from fullysparsefusion_tpu.config_compat import load_reference_config, load_fsf_config

NUSC = "/root/reference/projects/configs/nuScenes/FSF_nuScenes_config.py"
AV2 = "/root/reference/projects/configs/Argoverse2/FSF_AV2_config.py"


def test_load_raw_nusc_config():
    cfg = load_reference_config(NUSC)
    assert cfg["model"]["type"] == "FSF"
    assert len(cfg["class_names"]) == 10
    # _base_ inheritance pulled the dataloader config
    assert "data" in cfg


def test_interpret_nusc_config():
    c = load_fsf_config(NUSC)
    assert c.num_classes == 10
    assert c.num_cams == 6
    f = c.fsd
    assert f.segmentor.voxel_size == (0.2, 0.2, 0.2)
    assert f.segmentor.point_cloud_range == (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    assert f.segmentor.unet_encoder_channels[4] == (512, 512, 512)
    # z-padding 0 on stage 3's strided conv, flipped from (0,1,1) zyx
    assert f.segmentor.unet_strided_paddings[2] == (1, 1, 0)
    assert f.head.focal_gamma == 4.0
    assert f.head.code_size == 10
    assert f.head.nms_thr == 0.25
    assert f.cluster_voxel_sizes[5] == (0.05, 0.05, 8)
    assert f.connected_dists == (0.6, 0.6, 0.6, 0.2, 0.4, 0.1)
    assert f.group_names[1] == ("truck", "construction_vehicle")
    assert c.frustum_head.nms_thr == 0.35
    assert c.frustum_head.in_channel == 128 * 3 * 2 + 128
    assert c.refined_head.in_channel == 1024
    assert c.refined_head.loss_cls_weight == 2.0
    assert c.embed_dims == 1024
    # DistAssigner table: car 1.0, bus 4.0, barrier 0.0
    assert c.refine_max_dist[0] == 1.0
    assert c.refine_max_dist[3] == 4.0
    assert c.refine_max_dist[9] == 0.0


def test_interpret_av2_config():
    c = load_fsf_config(AV2)
    assert c.num_classes == 26
    assert c.num_cams == 7
    assert c.fsd.head.code_size == 8
    assert c.fsd.segmentor.point_cloud_range[3] == 204.8
    assert c.fsd.score_thresh[0] == 0.4
    assert c.fsd.connected_dists == (0.6, 0.1, 0.15, 1.0, 0.2, 0.15)
