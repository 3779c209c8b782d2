from .align import (  # noqa: F401
    Similarity2D,
    fit_similarity_2d,
    icp_2d_with_scale,
    match_by_timestamp,
)
from .georef import (  # noqa: F401
    georeference_trajectory,
    georeference_pcd,
    save_alignment_params,
    load_alignment_params,
)
from .cleanup import (  # noqa: F401
    sor_denoise,
    ransac_ground_plane,
    euclidean_clusters,
    cluster_bounding_boxes,
    intensity_filter,
    denoise_slam_map,
)
