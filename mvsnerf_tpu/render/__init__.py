from .renderer import (
    build_color_volume,
    gen_dir_feature,
    gen_pts_feats,
    run_network,
    render_rays,
    render_density,
    make_render_fn,
    render_image_chunked,
)
