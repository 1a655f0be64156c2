"""utils subpackage of tritd_tpu."""
