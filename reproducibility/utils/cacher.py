from plip_tpu.utils.cacher import (  # noqa: F401
    cache_hit_or_miss,
    cache_hit_or_miss_raw_filename,
    cache_numpy_object,
    cache_numpy_object_raw_filename,
    get_cache_name,
    get_savepath,
)
