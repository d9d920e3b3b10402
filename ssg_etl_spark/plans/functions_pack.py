"""functions_pack — filled in as operators land."""
