from lantern_extras_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    clip_pixel_batch,
    clip_preprocess,
    decode_image_features,
    fake_image_feature,
    fetch_bytes,
    fetch_media,
    frame_sample,
    resize_catmull_rom,
    with_media_metadata,
)
