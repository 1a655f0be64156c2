"""metrics subpackage of tritd_tpu."""
