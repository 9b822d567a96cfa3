"""Models: the neural module network executor and its modules."""

from stair_tpu.models.nmn import VideoNMN, NMNConfig  # noqa: F401
