"""Math / ops layer: pure-JAX building blocks shared by models and renderers."""

from color_neus_tpu.ops.embedding import positional_encoding, embedding_dim
from color_neus_tpu.ops.rays import (
    near_far_from_sphere,
    rays_for_pixels,
    all_rays_for_camera,
    sample_pdf,
    sample_pixels_uniform,
    sample_pixels_masked,
)
from color_neus_tpu.ops.transforms import (
    aa_to_rotmat,
    rot6d_to_rotmat,
    quat_to_rotmat,
    rotmat_to_quat,
    inverse_sigmoid,
    convert3x4_4x4,
    load_K_Rt_from_P,
    pose_spherical,
)
