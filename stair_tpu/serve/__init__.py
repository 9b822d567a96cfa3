"""Serving: the video-chat demo server and logging utilities."""
