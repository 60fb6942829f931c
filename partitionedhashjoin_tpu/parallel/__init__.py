"""Multi-chip execution: mesh utilities and the distributed shuffle join."""
