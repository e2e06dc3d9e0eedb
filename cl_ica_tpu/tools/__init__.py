"""Offline dataset tooling (reference tools/3dident/*)."""
