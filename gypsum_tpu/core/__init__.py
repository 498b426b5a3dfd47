"""Shared vocabulary: physical constants, configuration tree, unit newtypes, events."""
