from xhs_ocr_ray.png.codec import decode_png, encode_png

__all__ = ["decode_png", "encode_png"]
