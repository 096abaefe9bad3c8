from .stencil import stencil5_matvec, stencil5_available

__all__ = ["stencil5_matvec", "stencil5_available"]
