"""Utility layer: configuration, expressions, math helpers."""

from .config import Config, Parameter, config, environment
