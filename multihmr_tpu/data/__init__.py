from multihmr_tpu.data.collate import collate_padded, resize_with_K  # noqa: F401
