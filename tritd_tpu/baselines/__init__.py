"""baselines subpackage of tritd_tpu."""
