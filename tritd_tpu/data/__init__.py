"""data subpackage of tritd_tpu."""
