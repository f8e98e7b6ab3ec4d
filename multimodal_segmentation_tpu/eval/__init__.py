"""Evaluation: ModelTester parity with the reference test protocol."""

from multimodal_segmentation_tpu.eval.tester import ModelTester

__all__ = ["ModelTester"]
