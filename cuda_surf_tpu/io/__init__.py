from .image import (imread_gray, read_pgm, write_pgm, write_ppm,
                    write_png, read_png_gray)

__all__ = ["imread_gray", "read_pgm", "write_pgm", "write_ppm",
           "write_png", "read_png_gray"]
