"""llm_pack — filled in as operators land."""
