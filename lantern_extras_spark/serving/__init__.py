"""Serving-side transports: the reference's index TCP protocol (N2) and the
collections HTTP API (H8), both stdlib-only and loopback-testable."""
