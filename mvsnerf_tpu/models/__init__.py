from .layers import (
    linear,
    abn,
    conv2d,
    conv3d,
    conv_transpose3d,
    multi_head_attention,
    layer_norm,
    init_linear,
    init_abn,
    init_conv2d,
    init_conv3d,
    init_mha,
)
from .mvsnet import (
    feature_net_apply,
    cost_reg_apply,
    mvsnet_apply,
    depth_plane_values,
    init_feature_net,
    init_cost_reg,
    init_mvsnet,
    N_DEPTH_PLANES,
)
from .nerf_mlp import (
    mlp_apply,
    mlp_apply_alpha,
    init_mlp,
    mlp_v0_apply,
    mlp_v1_apply,
    mlp_v2_apply,
    mlp_fusion_apply,
)
