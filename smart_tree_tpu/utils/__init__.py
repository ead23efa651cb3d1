from .configs import compose, instantiate
