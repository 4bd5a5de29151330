from .boxfilter import box_filter, box_filter_u8
from .atrous import atrous_level_ref, svgf_spatial_ref, variance_blur3x3
from .temporal import temporal_accumulate, bilinear_gather, bilinear_gather_many
from .filters import apply_filter, gaussian_filter, cross_bilateral_filter
from .raymarch import (
    Scene, Camera, Materials, cornell_scene, cornell_camera,
    render_gbuffer, raymarch, sdf_scene, sdf_normal, camera_rays,
)
