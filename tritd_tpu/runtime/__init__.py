"""runtime subpackage of tritd_tpu."""
