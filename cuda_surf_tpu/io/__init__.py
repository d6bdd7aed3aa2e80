from .image import imread_gray, read_pgm, write_pgm, read_png_gray

__all__ = ["imread_gray", "read_pgm", "write_pgm", "read_png_gray"]
