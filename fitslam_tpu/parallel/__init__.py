"""Device-mesh construction and sharded solvers.

The reference distributes work as separate ROS processes over DDS
(SURVEY.md §2.5). Here distribution is a device mesh: observations and grid
batches are sharded with `jax.sharding`, XLA inserts the psum/all-gather
collectives over ICI, and multi-host runs extend the same mesh over DCN via
`jax.distributed`.
"""
