"""Test fixtures: synthetic scene graphs, questions and video features."""
