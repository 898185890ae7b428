from . import plot
