from lantern_extras_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_image_features,
    fake_image_feature,
    fetch_bytes,
    fetch_media,
    frame_sample,
    with_media_metadata,
)
