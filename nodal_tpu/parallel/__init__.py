"""Multi-device execution: meshes, sharded batched solves, sharded grid CG."""
