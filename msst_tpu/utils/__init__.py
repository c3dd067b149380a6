"""Host-side utilities: dataset I/O (KITTI, PCD, rosbag, packets), synthetic
simulation, profiling."""
