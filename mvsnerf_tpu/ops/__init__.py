from .interp import (
    grid_sample_2d,
    grid_sample_3d,
    index_point_feature,
    interpolate_bilinear_resize,
)
from .encoding import positional_encoding, embedder_out_dim
from .compositing import depth2dist, raw2alpha, raw2outputs
from .sampling import (
    stratified_z_vals,
    sample_pdf,
    dda,
    ray_marcher,
    ray_marcher_fine,
)
from .geometry import (
    pixel_grid,
    get_ray_directions,
    get_rays,
    get_ndc_rays,
    rays_from_pixels,
    get_ndc_coordinate,
    get_ndc_coordinate_bbox,
    build_rays_train,
    build_rays_test,
    get_nearest_pose_ids,
    RayBatch,
)
from .homography import (
    plane_sweep_grid,
    homo_warp,
    build_cost_volume,
    build_cost_volume_feat,
    in_bounds_mask,
)
