from lantern_extras_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_image_features,
    fake_image_feature,
    frame_sample,
    with_media_metadata,
)
