from xhs_ocr_ray.gif.codec import decode_gif, encode_gif

__all__ = ["decode_gif", "encode_gif"]
