"""Dataset readers/writers and the synthetic LIO world simulator."""
