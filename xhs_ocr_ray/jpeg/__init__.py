from xhs_ocr_ray.jpeg.codec import decode_jpeg, encode_jpeg

__all__ = ["decode_jpeg", "encode_jpeg"]
