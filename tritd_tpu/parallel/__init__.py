"""parallel subpackage of tritd_tpu."""
