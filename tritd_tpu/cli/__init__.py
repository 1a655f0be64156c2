"""cli subpackage of tritd_tpu."""
