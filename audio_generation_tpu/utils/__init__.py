from audio_generation_tpu.utils.misc import (  # noqa: F401
    approximate_square_root,
    bitrate_calculator,
    dist_to_uniform,
    get_latest_file,
    interpolate_lists,
    losses_to_running_loss,
    np_softmax,
    print_stale_clusters,
    tuple_checker,
)
